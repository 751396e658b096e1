package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Regular-grid time-series operators: upsample to a dense grid, gap fill
  * (forward fill / linear interpolation on an exact integer grid), lagged
  * diff / percent change, and run-length encoding.
  *
  * Beyond-reference superset: polars ships `upsample`, `interpolate`,
  * `fill_null(strategy="forward")`, `diff` / `pct_change` and `rle_id` as
  * first-class frame operations; the reference lake engine
  * (TomScheffers/polars-lake) exposes none of them through its SQL surface,
  * so a polars user migrating a feature pipeline hits this gap first. Here
  * each op is a declarative window/join plan Catalyst can push through:
  *
  *  - no `mapPartitions`, no UDFs — every fill is `last/first(ignoreNulls)`
  *    over a per-key window, so whole-stage codegen applies and the only
  *    exchange is one hash partitioning by key that ALL the window ops and
  *    the upsample join reuse;
  *  - interpolation runs on an exact integer grid (caller scales values to
  *    long ticks, timestamps to epoch seconds) with floor division written
  *    as `(num - pmod(num, den)) div den` — the subtraction makes the
  *    division exact, so any ANSI engine (the DuckDB oracle included)
  *    reproduces results bit-for-bit regardless of its `/` rounding mode;
  *  - at 100 TB the unit of parallelism is the KEY (a series), not the row:
  *    per-key state never leaves its partition, so a 1000-executor cluster
  *    scales with the number of series. The one real hazard is a single
  *    pathological key whose [min, max] span explodes the dense grid —
  *    [[upsample]] predicts the worst key's tick count with one aggregate
  *    and fails loudly BEFORE paying for the explode (the same
  *    predict-before-pay discipline as `Graphs.projectBipartite`).
  */
object TimeSeries {

  /** Dense per-key grid at a fixed step: every key gets one row per tick
    * from its own min(ts) to max(ts); ticks absent from the input carry
    * null observation columns (fill them with [[fillForward]] /
    * [[interpolateLinear]]).
    *
    * The input's `tsCol` must already be aligned to the grid (e.g.
    * `date_trunc('day', ts)` for a daily grid) and unique per (key, ts) —
    * aggregate first. Plan shape: NO grid join. Each observation row
    * renders its own gap with `lead` + `explode(sequence(ts, next−step))`,
    * so the only exchange is the window's hashpartitioning(key) — which
    * every downstream fill/interpolation/EWMA window then REUSES (an
    * equi-join on (key, ts) would partition by both and force a second
    * exchange before the first window). Grid size is Σ per-key spans /
    * step — predicted from one bounds aggregate and guarded by
    * `maxTicksPerKey` (a 10-year span on a 1-second grid is a 315M-row
    * key no one meant to ask for; the aggregate names the worst key
    * instead of discovering it as an executor OOM inside the explode).
    */
  def upsample(
      df: DataFrame, keyCol: String, tsCol: String, stepSeconds: Long,
      maxTicksPerKey: Long = 2000000L): DataFrame = {
    require(stepSeconds > 0, s"stepSeconds must be positive: $stepSeconds")
    val worst = df.groupBy(col(keyCol))
      .agg(min(col(tsCol)).as("__lo"), max(col(tsCol)).as("__hi"))
      .select(col(keyCol),
        (((unix_micros(col("__hi")) - unix_micros(col("__lo")))
          / lit(stepSeconds * 1000000L)).cast("long") + 1L).as("__ticks"))
      .orderBy(col("__ticks").desc).limit(1).collect()
    worst.headOption.foreach { r =>
      val ticks = r.getLong(1)
      require(ticks <= maxTicksPerKey,
        s"upsample: key ${r.get(0)} spans $ticks ticks at step ${stepSeconds}s " +
          s"(cap $maxTicksPerKey) — widen the step or raise maxTicksPerKey")
    }
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol))
    val step = expr(s"INTERVAL $stepSeconds SECONDS")
    val valueCols = df.columns.filter(c => c != keyCol && c != tsCol)
    df.withColumn("__nxt", lead(col(tsCol), 1).over(w))
      .withColumn("__tick", explode(
        // gaps under one step (duplicate or unaligned neighbors) render
        // only their own tick — sequence() would refuse start > stop
        when(col("__nxt").isNull || col("__nxt") - step < col(tsCol),
          array(col(tsCol)))
          .otherwise(sequence(col(tsCol), col("__nxt") - step, step))))
      .select((col(keyCol) +: col("__tick").as(tsCol) +:
        valueCols.toSeq.map(c =>
          when(col("__tick") === col(tsCol), col(c)).as(c))): _*)
  }

  /** Forward fill: each null observation takes the most recent non-null
    * value of its key's series (polars `fill_null(strategy="forward")`).
    * Leading nulls (no prior observation) stay null — inventing a value
    * before the first measurement would be a correctness bug, not a fill.
    * One window per column over the shared (key, ts) sort; rows-unbounded-
    * preceding `last(ignoreNulls)` is a running O(1) state per key, fully
    * codegen'd, no shuffle beyond the partitionBy(key) exchange.
    */
  def fillForward(
      df: DataFrame, keyCol: String, tsCol: String, valueCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    valueCols.foldLeft(df) { (acc, c) =>
      acc.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
  }

  /** Linear interpolation on an exact integer grid (polars `interpolate`):
    * a null tick between two observed anchors (t0,v0) and (t1,v1) becomes
    * `v0 + (v1−v0)·(t−t0) div (t1−t0)` with floor division; leading and
    * trailing nulls stay null (polars parity — there is no second anchor to
    * interpolate toward).
    *
    * `valueCol` must be an integer column (scale your measure to ticks —
    * cents, micros — first) and `tsCol` a timestamp; arithmetic runs on
    * epoch seconds. Floor division is spelled `(num − pmod(num, den)) div
    * den`: subtracting the non-negative remainder makes the division exact,
    * so the result is engine-portable even though Spark's `div` truncates
    * toward zero while e.g. DuckDB's `//` floors. Two windows (previous /
    * next anchor) over the same (key, ts) sort — one exchange, no UDF.
    */
  def interpolateLinear(
      df: DataFrame, keyCol: String, tsCol: String, valueCol: String): DataFrame = {
    val back = Window.partitionBy(col(keyCol)).orderBy(col(tsCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy(col(keyCol)).orderBy(col(tsCol))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val v = col(valueCol)
    val anchorTs = when(v.isNotNull, unix_seconds(col(tsCol)))
    df.withColumn("__pv", last(v, ignoreNulls = true).over(back))
      .withColumn("__pt", last(anchorTs, ignoreNulls = true).over(back))
      .withColumn("__nv", first(v, ignoreNulls = true).over(fwd))
      .withColumn("__nt", first(anchorTs, ignoreNulls = true).over(fwd))
      .withColumn("__num",
        (col("__nv") - col("__pv")) * (unix_seconds(col(tsCol)) - col("__pt")))
      .withColumn("__den", col("__nt") - col("__pt"))
      .withColumn(valueCol,
        when(v.isNotNull, v)
          .when(col("__pv").isNotNull && col("__nv").isNotNull,
            expr("__pv + ((__num - pmod(__num, __den)) div __den)")))
      .drop("__pv", "__pt", "__nv", "__nt", "__num", "__den")
  }

  /** Lagged difference and percent change in basis points on the integer
    * grid (polars `diff` / `pct_change`): `diff = v − lag(v)`, `pct_bps =
    * (v − prev)·10000 div prev` with the same exact floor division as
    * [[interpolateLinear]]. First row per key and non-positive previous
    * values yield null (a percent change against zero or negative base has
    * no meaning). One lag window over the shared (key, ts) exchange.
    * Domain: |diff| must stay within Long.MaxValue/10⁴ (~9.2e14 ticks) on
    * rows where the change is computed — enforced per row by a loud
    * `assert_true`, since the wrapped numerator would otherwise produce a
    * silently wrong basis-point value in non-ANSI mode.
    */
  def diffPct(
      df: DataFrame, keyCol: String, tsCol: String, valueCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol))
    // Domain guard: diff·10⁴ must fit a long — |diff| past ~9.2e14 ticks
    // would wrap the basis-point numerator silently in non-ANSI mode.
    // Rides the kept column (always-true-or-throws), evaluated per row.
    val guard = coalesce(assert_true(
      col("__prev").isNull || col("__prev") <= 0L ||
        abs(col("diff")) <= lit(Long.MaxValue / 10000L),
      lit("diffPct: |diff| exceeds Long.MaxValue/10^4 ticks — rescale the " +
        "series before taking basis points")).cast("boolean"), lit(true))
    df.withColumn("__prev", lag(col(valueCol), 1).over(w))
      .withColumn("diff", col(valueCol) - col("__prev"))
      .withColumn("__num", col("diff") * 10000L)
      .withColumn("pct_bps",
        when(guard && col("__prev") > 0L,
          expr("(__num - pmod(__num, __prev)) div __prev")))
      .drop("__prev", "__num")
  }

  /** Gap-based sessionization in BATCH — the relational twin of the
    * streaming `session_window` path (`StreamingIngest.sessionWindows`):
    * a new session starts when the gap from the key's previous event
    * exceeds `gapSeconds`; output is one row per session with start, end,
    * and event count. Same plan family as [[rle]] — one lag flag, one
    * running sum, one groupBy, all on the shared (key, ts) exchange.
    * Safe under timestamp ties (equal timestamps have gap 0, so the flag
    * sequence — and therefore the session segmentation — is invariant
    * under tie permutation; no tie-break column needed, unlike rle).
    */
  def sessions(
      df: DataFrame, keyCol: String, tsCol: String, gapSeconds: Long): DataFrame = {
    require(gapSeconds > 0, s"gapSeconds must be positive: $gapSeconds")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol))
    val run = Window.partitionBy(col(keyCol)).orderBy(col(tsCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prev = lag(col(tsCol), 1).over(w)
    df.withColumn("__new",
        when(prev.isNull ||
          unix_micros(col(tsCol)) - unix_micros(prev) > gapSeconds * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("__new")).over(run))
      .groupBy(col(keyCol), col("session_id"))
      .agg(min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"))
  }

  /** Run-length encoding (polars `rle` / `rle_id`): collapse each key's
    * ordered series into (run_id, value, run_len, run_start) rows, one per
    * maximal run of equal consecutive values. A change flag (`lag` differs
    * or is null), a running sum for run ids, then one groupBy — the window
    * and the aggregation share the single partitionBy(key) exchange. The
    * session/state-dwell primitive: "how long did each user stay in state
    * X" is exactly the run table.
    */
  /** Windowed exponentially-weighted moving average on the exact integer
    * grid: with smoothing α = a/s as an exact rational and window N,
    *
    *   ewma_t = floorDiv( Σ_{k=0..N−1} x_{t−k}·(s−a)^k·s^(N−1−k),
    *                      Σ_{k: x_{t−k} present} (s−a)^k·s^(N−1−k) )
    *
    * — polars `ewm_mean(adjust=true)` TRUNCATED to the last N observations.
    * At the defaults (α=0.3, N=8) the dropped tail carries (1−α)^8 ≈ 5.8%
    * of the weight mass, and because the denominator sums only the PRESENT
    * terms the result is an exactly-renormalized weighted mean, not a
    * biased estimate. The truncation is what buys both properties that
    * matter here: the value is a finite integer polynomial any ANSI engine
    * reproduces bit-for-bit, and the state is N lag columns over the one
    * (key, ts) exchange every op in this file shares — infinite-history
    * EWMA is a sequential per-key scan, which is exactly the shape a
    * distributed engine should refuse.
    *
    * Null observations are EXCLUDED from both sums (missing, not zero); a
    * row whose whole window is null yields null. Overflow guard: the SUM
    * of all N weights (computed exactly in BigInt at plan-build time) is
    * required to satisfy Σw · (2^31−1) ≤ Long.MaxValue, so the whole __num
    * accumulation stays in a long for any |x| < 2^31 — bounding only the
    * single largest weight under 2^31 is not enough, because __num sums N
    * terms and their combined mass can overflow even when each term fits
    * (e.g. α=1/10, N=10: max weight 10^9 < 2^31 but Σw ≈ 6.5e9).
    */
  def ewmaWindowed(
      df: DataFrame, keyCol: String, tsCol: String, valueCol: String,
      alphaNum: Int = 3, alphaDen: Int = 10, window: Int = 8): DataFrame = {
    require(alphaNum > 0 && alphaNum < alphaDen, s"need 0 < α < 1: $alphaNum/$alphaDen")
    require(window >= 1, s"window must be >= 1: $window")
    val weightSum = (0 until window)
      .map(k => BigInt(alphaDen - alphaNum).pow(k) * BigInt(alphaDen).pow(window - 1 - k))
      .sum
    require(weightSum * Int.MaxValue <= BigInt(Long.MaxValue),
      s"Σ weights = $weightSum overflows the integer grid for 32-bit values — " +
        "shrink window or α's denominator")
    val s = alphaDen.toLong
    val a = alphaNum.toLong
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol))
    def pw(base: Long, e: Int): Long = (0 until e).foldLeft(1L)((acc, _) => acc * base)
    val terms = (0 until window).map { k =>
      val weight = pw(s - a, k) * pw(s, window - 1 - k)
      val xk = lag(col(valueCol), k).over(w)
      (when(xk.isNotNull, xk * lit(weight)).otherwise(lit(0L)),
        when(xk.isNotNull, lit(weight)).otherwise(lit(0L)))
    }
    df.withColumn("__num", terms.map(_._1).reduce(_ + _))
      .withColumn("__den", terms.map(_._2).reduce(_ + _))
      .withColumn("ewma",
        when(col("__den") > 0L,
          expr("(__num - pmod(__num, __den)) div __den")))
      .drop("__num", "__den")
  }

  /** Rolling anomaly flags on the exact integer grid: a row is anomalous
    * when its value deviates from its key's TRAILING window (the N rows
    * strictly before it — the current row is excluded so a spike cannot
    * mask itself) by more than k standard deviations. The test
    * `(x − μ)² > k²·σ²` is evaluated as the equivalent integer predicate
    *
    *   kd²·(N·x − S1)²  >  kn²·(N·S2 − S1²)        (k = kn/kd, S1 = Σxᵢ,
    *                                                S2 = Σxᵢ² over the window)
    *
    * — multiply both sides of the float form by kd²·N² and every term is
    * an integer, so the flag is bit-reproducible by any exact engine (the
    * DuckDB oracle runs the same products in HUGEINT; no sqrt, no float
    * variance). A CONSTANT window (σ = 0) flags any deviation from it —
    * the "sensor unstuck" signal. Rows with fewer than `window` prior
    * observations (or a null value) emit a NULL flag: insufficient
    * history is "don't know", never "normal".
    *
    * Scale shape: two running window sums + one comparison over the SAME
    * partitionBy(key) exchange every op in this file shares — anomaly
    * scanning a filled series adds zero shuffles to the upsample →
    * interpolate chain. Overflow is excluded STATICALLY: the products run
    * in Decimal(38,0) and a plan-build BigInt guard requires
    * 4·kd²·N²·X² < 10^38 and 2·kn²·N²·X² < 10^38 for X = `maxAbsValue`
    * (a decimal overflow in non-ANSI mode would silently NULL the flag —
    * the guard makes that unreachable), while an `assert_true` riding the
    * flag column enforces |x| ≤ X on every row at run time.
    */
  def anomalies(
      df: DataFrame, keyCol: String, tsCol: String, valueCol: String,
      window: Int, kNum: Int = 3, kDen: Int = 1,
      maxAbsValue: Long = 1000000000000000L): DataFrame = {
    require(window >= 2, s"window must be >= 2: $window")
    require(kNum > 0 && kDen > 0, s"need k = kNum/kDen > 0: $kNum/$kDen")
    require(maxAbsValue > 0, s"maxAbsValue must be positive: $maxAbsValue")
    val lim = BigInt(10).pow(38)
    val nB = BigInt(window); val xB = BigInt(maxAbsValue)
    require(BigInt(kDen).pow(2) * 4 * nB.pow(2) * xB.pow(2) < lim &&
      BigInt(kNum).pow(2) * 2 * nB.pow(2) * xB.pow(2) < lim,
      s"anomalies: window=$window, k=$kNum/$kDen, maxAbsValue=$maxAbsValue " +
        "exceeds the Decimal(38,0) grid — shrink the window, k, or the " +
        "value bound")
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol))
      .rowsBetween(-window, -1)
    val x = col(valueCol).cast(dec)
    val m = count(col(valueCol)).over(w)
    val s1 = sum(x).over(w)
    val s2 = sum(x * x).over(w)
    val n = lit(window.toLong).cast(dec)
    val d = n * x - s1
    val v = n * s2 - s1 * s1
    val flag = when(col(valueCol).isNull || m < lit(window.toLong),
        lit(null).cast("boolean"))
      .otherwise(lit(kDen.toLong * kDen).cast(dec) * d * d >
        lit(kNum.toLong * kNum).cast(dec) * v)
    // Domain guard evaluated on EVERY row (a when() that is always true
    // or throws): rows with a null flag still feed later windows, so the
    // bound must hold for them too.
    val guard = coalesce(assert_true(
      col(valueCol).isNull || abs(col(valueCol)) <= lit(maxAbsValue),
      lit(s"anomalies: |$valueCol| exceeds maxAbsValue=$maxAbsValue — " +
        "raise the bound (the overflow guard re-derives)")).cast("boolean"),
      lit(true))
    df.withColumn("anomaly", when(guard, flag))
  }

  def rle(
      df: DataFrame, keyCol: String, orderCols: Seq[String], valueCol: String): DataFrame = {
    require(orderCols.nonEmpty, "rle needs at least one ordering column")
    // The ordering must be a TOTAL order within each key (pass a tie-break
    // column such as the event id) — under ties the run segmentation would
    // be partition-order-dependent and no longer deterministic.
    val ord = orderCols.map(col)
    val w = Window.partitionBy(col(keyCol)).orderBy(ord: _*)
    val run = Window.partitionBy(col(keyCol)).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prev = lag(col(valueCol), 1).over(w)
    df.withColumn("__chg",
        when(prev.isNull || prev =!= col(valueCol), 1L).otherwise(0L))
      .withColumn("run_id", sum(col("__chg")).over(run))
      .groupBy(col(keyCol), col("run_id"))
      .agg(min(col(valueCol)).as("value"),
        count(lit(1)).as("run_len"),
        min(col(orderCols.head)).as("run_start"))
  }
}
