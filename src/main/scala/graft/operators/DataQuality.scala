package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{NumericType, StringType}

/** Data-quality profiling and constraint validation — the admission gate of
  * a training-data pipeline (and of any lakehouse ingest): before a batch
  * joins the corpus, measure it and verify the contract.
  *
  * Scale shape (the Deequ design, re-expressed):
  *   - [[profile]] computes EVERY per-column statistic in ONE aggregate
  *     over ONE scan — k columns do not cost k jobs. The wide one-row
  *     aggregate is unpivoted to a (column, stat...) report driver-side
  *     (the row is k-sized, not data-sized).
  *   - [[check]] partitions constraints by shape: all ROW-LOCAL predicates
  *     (not-null, range, regex, custom) fold into the same single-scan
  *     aggregate as conditional counts; uniqueness is one groupBy on the
  *     key; referential integrity is one anti-join (broadcast when the
  *     referenced side is a dimension). A 12-constraint suite costs one
  *     scan + one shuffle per non-local constraint, never 12 scans.
  *
  * Everything is exact integer counting, so the full report is
  * reproducible by the DuckDB oracle (hash-compared in the gate). At
  * 100 TB the only count worth approximating is `n_distinct`; [[profile]]
  * takes `approxDistinct = true` for that path (HLL, one pass, no
  * shuffle-heavy exact distinct) — the gate pins the exact variant.
  */
object DataQuality {

  // ---------------------------------------------------------------- profile

  /** Per-column profile: row count, null count, exact distinct count, and
    * (numeric columns) min/max — one aggregate, one scan. `n_distinct`
    * counts non-null values; min/max are NULL for non-numeric columns
    * (type-stable LONG report so the unpivot is a clean union).
    */
  def profile(
      df: DataFrame,
      columns: Seq[String],
      approxDistinct: Boolean = false): DataFrame = {
    val schema = df.schema
    val aggs: Seq[Column] = columns.flatMap { c =>
      val distinctC =
        if (approxDistinct) approx_count_distinct(col(c)).as(s"__d_$c")
        else count_distinct(col(c)).as(s"__d_$c")
      val (mn, mx) = schema(c).dataType match {
        case _: NumericType =>
          (min(col(c)).cast("long").as(s"__mn_$c"),
           max(col(c)).cast("long").as(s"__mx_$c"))
        case _ =>
          (lit(null).cast("long").as(s"__mn_$c"),
           lit(null).cast("long").as(s"__mx_$c"))
      }
      Seq(count(col(c)).as(s"__c_$c"), distinctC, mn, mx)
    }
    val wide = df.agg(count(lit(1)).as("__rows"), aggs: _*)
    // Unpivot the one k-wide row into k report rows: stack() keeps it in
    // the same job; the input to stack is the single aggregate row.
    val stacked = columns.map { c =>
      struct(
        lit(c).as("column"),
        col("__rows").as("n_rows"),
        (col("__rows") - col(s"__c_$c")).as("n_nulls"),
        col(s"__d_$c").as("n_distinct"),
        col(s"__mn_$c").as("min_long"),
        col(s"__mx_$c").as("max_long"))
    }
    wide.select(explode(array(stacked: _*)).as("r")).select("r.*")
  }

  // ----------------------------------------------------------------- drift

  /** Distribution-drift report between two snapshots of one numeric
    * signal — the "did this crawl/ingest change the data's shape?" monitor
    * a pipeline runs before promoting a batch. Values bin into `nBins`
    * fixed-width bins (clamped to the first/last bin, so outliers drift
    * the TAILS instead of vanishing); each bin reports both counts plus
    * `dev = |n_before·N_after − n_after·N_before|`, the EXACT integer
    * numerator of that bin's contribution to total-variation distance
    * (TVD = Σ dev / (2·N_before·N_after)). Keeping the report on integer
    * counts makes it bit-reproducible across engines — the fractional
    * normalization is one driver-side division the caller applies to a
    * dozen rows, not something the distributed job needs.
    *
    * Scale shape: one narrow map + one `nBins`-row aggregate per side —
    * no join against the other snapshot's rows, so the two scans
    * parallelize independently and the merge is a bin-keyed outer join of
    * two tiny frames. Values must be non-negative and below 2^53 (the
    * binning floor is IEEE-exact there; lengths, counts, and scores all
    * qualify).
    *
    * `dev` is Decimal(38,0), NOT long: a single bin's numerator can reach
    * N_before·N_after, which wraps a 64-bit product once the table×batch
    * row product passes ~9.2e18 — a 1e12-row table against a 1e7-row
    * batch is over it. The decimal products are exact to 38 digits
    * (counts are ≤ 19 digits each) and codegen like any arithmetic.
    */
  def histogramDrift(before: DataFrame, after: DataFrame, value: Column,
      binWidth: Long, nBins: Int): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    require(nBins >= 2, "need at least 2 bins")
    def hist(df: DataFrame, as: String): DataFrame = df
      .select(least(greatest(floor(value / binWidth), lit(0L)),
        lit(nBins - 1L)).cast("long").as("bin"))
      .groupBy("bin").agg(count(lit(1)).as(as))
    val j = hist(before, "n_before")
      .join(hist(after, "n_after"), Seq("bin"), "full_outer")
      .na.fill(0L, Seq("n_before", "n_after"))
    // The totals window runs over the post-aggregation nBins-row frame —
    // a single-partition window over ≤ nBins rows, not a data-sized sort.
    val all = Window.partitionBy(lit(1))
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    j.withColumn("__tb", sum("n_before").over(all))
      .withColumn("__ta", sum("n_after").over(all))
      .select(col("bin"), col("n_before"), col("n_after"),
        abs(col("n_before").cast(dec) * col("__ta").cast(dec) -
          col("n_after").cast(dec) * col("__tb").cast(dec))
          .as("dev"))
  }

  /** Quantile binning (polars `qcut` / pandas `qcut`): assign each row a
    * bin 1..k so the bins hold (as close as integers allow) equal row
    * counts — the standard "length decile" / "score quartile" bucketing a
    * curation pipeline stratifies on before sampling. Implemented as
    * `ntile(k)` over a TOTAL order (`valueCol`, then `tieCols`): ntile's
    * floor-based bin boundaries are a pure function of (rank, n), so with a
    * deterministic total order the assignment is engine-portable and
    * reproducible — unlike quantile-boundary binning, whose float boundary
    * estimates differ across engines. The caller must make the order total
    * (pass the row id as a tie-break); equal values CAN straddle a bin
    * boundary, which is what makes exact equal-count bins possible at all.
    *
    * Scale note: `ntile` over an unpartitioned window is NOT the tool —
    * Spark satisfies an empty partitionSpec with Exchange SinglePartition,
    * moving every row to one task. This implementation computes the same
    * assignment from a RANGE-PARTITIONED sort instead: repartitionByRange
    * on the total order spreads the sort across the cluster; the local
    * rank within each range partition reads off `monotonically_increasing_
    * id()` applied AFTER `sortWithinPartitions` (the value is by contract
    * `partition id << 33 | in-order record number` — a partition-local
    * rank with NO window, so no second data-sized Exchange: a
    * `row_number() over (partition by pid)` here would re-shuffle every
    * row by pid hash, since hash-by-pid is a different partitioning than
    * the range exchange satisfies). The per-partition counts (≤
    * shuffle-partitions rows) aggregate into offsets that a broadcast
    * join adds back, so global rank = offset + local rank; the bin is
    * then ntile's own front-loaded arithmetic on (rank, n, k) in exact
    * integer `div`. The data is exchanged ONCE (the range shuffle); the
    * only single-partition exchange carries the ≤ P aggregated count
    * rows. The whole thing is ONE query, so the range exchange is planned
    * once and reused by both consumers (ReuseExchange) — the sampled
    * range boundaries cannot drift between the rank pass and the count
    * pass (and the reuse precondition is enforced below). The counts come
    * from `spark_partition_id()` independently of the id encoding, and an
    * `assert_true` on them refuses partitions at the 2^33-row encoding
    * limit instead of silently wrapping the rank. For per-group binning
    * partition by the group instead; for 100 TB-scale APPROXIMATE deciles
    * use the catalog's quantile sketches ([[qcutApprox]]) — this operator
    * is the exact path.
    */
  def qcut(df: DataFrame, valueCol: String, k: Int, tieCols: Seq[String]): DataFrame = {
    require(k >= 2, s"need at least 2 bins: $k")
    require(tieCols.nonEmpty, "qcut needs a tie-break column for a total order")
    // The one-query reuse argument above is a PRECONDITION, not a hope:
    // with exchange reuse disabled the rank branch and the offsets branch
    // would each re-run the range exchange, and RangePartitioner re-SAMPLES
    // its boundaries per execution (the sample seed derives from the RDD
    // id) — the two passes could disagree on which partition a row belongs
    // to, silently mis-aligning every offset. Refuse loudly instead.
    require(df.sparkSession.conf.get("spark.sql.exchange.reuse", "true").toBoolean,
      "qcut requires spark.sql.exchange.reuse=true: the rank and offset " +
        "passes must read ONE materialized range shuffle — re-executed " +
        "exchanges re-sample their boundaries and the offsets mis-align")
    val ord: Seq[Column] = col(valueCol) +: tieCols.map(col)
    val p = math.max(1, df.sparkSession.conf
      .get("spark.sql.shuffle.partitions", "32").toInt)
    val ranged = df.repartitionByRange(p, ord: _*)
    // Local rank with no window: after the partition-local sort,
    // monotonically_increasing_id() is `pid << 33 | record number` in
    // iteration (= sorted) order. The nondeterministic projection also
    // BLOCKS EliminateSorts from dropping the sort underneath it.
    val withRn = ranged.sortWithinPartitions(ord: _*)
      .withColumn("__qcut_mid", monotonically_increasing_id())
      .withColumn("__qcut_pid", shiftright(col("__qcut_mid"), 33).cast("int"))
      .withColumn("__qcut_rn",
        col("__qcut_mid").bitwiseAND(lit((1L << 33) - 1)) + lit(1L))
      .drop("__qcut_mid")
    // P-row offsets frame: rows ranked before each range partition, plus
    // the global total. The unpartitioned running-sum window here is over
    // the ≤ P aggregated rows — the same bounded shape histogramDrift uses.
    // Counted by spark_partition_id(), NOT the id encoding, so the
    // assert_true below soundly refuses a partition that would overflow
    // the 33-bit record number (8.6 B rows in ONE range partition).
    val offs = ranged.select(spark_partition_id().as("__qcut_pid"))
      .groupBy(col("__qcut_pid")).agg(count(lit(1)).as("__qcut_cnt"))
      // The guard rides INSIDE the kept offset expression (null + 0 when
      // healthy) — a standalone dropped column would be pruned unevaluated.
      .withColumn("__qcut_off", coalesce(sum("__qcut_cnt").over(
        Window.orderBy("__qcut_pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)) +
        coalesce(assert_true(
          col("__qcut_cnt") <= lit((1L << 33) - 1L),
          lit("qcut: a range partition exceeds 2^33 rows — raise the " +
            "partition count")).cast("long"), lit(0L)))
      .withColumn("__qcut_n", sum("__qcut_cnt").over(Window.partitionBy(lit(1))))
      .select("__qcut_pid", "__qcut_off", "__qcut_n")
    // ntile's assignment as a pure function of (global rank r, n, k):
    // the first n % k buckets take ceil(n/k) rows, the rest floor(n/k) —
    // exact integer `div`, no float boundary to misround. The ELSE branch's
    // divisor q is 0 only when k > n, and then r <= cut always holds.
    withRn.join(broadcast(offs), "__qcut_pid")
      .withColumn("__qcut_r", col("__qcut_off") + col("__qcut_rn"))
      .withColumn("bin", expr(
        s"""CASE WHEN __qcut_r <= (__qcut_n div $k + 1) * (__qcut_n % $k)
           |THEN (__qcut_r - 1) div (__qcut_n div $k + 1) + 1
           |ELSE __qcut_n % $k +
           |  (__qcut_r - (__qcut_n div $k + 1) * (__qcut_n % $k) - 1)
           |    div (__qcut_n div $k) + 1 END""".stripMargin).cast("int"))
      .drop("__qcut_pid", "__qcut_rn", "__qcut_off", "__qcut_n", "__qcut_r")
  }

  /** PER-GROUP quantile binning (polars `qcut().over(group)`): bin 1..k
    * within each group over the (value, tie) total order — "score deciles
    * within each language/domain", the stratify-within-stratum step a
    * mixture-curation pipeline runs before per-domain sampling. Here
    * `ntile` IS the right tool (unlike the global [[qcut]]): the window
    * partitions by the GROUP, so Spark plans one hashpartitioning(group)
    * exchange and every group ranks inside its own partition — the unit
    * of parallelism is the group, the same shape as every per-key series
    * op. A single group much larger than a partition's memory is the
    * caller's cue to use [[qcut]] on that group's slice (or the catalog
    * sketches); groups at that scale are no longer "strata".
    */
  def qcutPerGroup(
      df: DataFrame, groupCol: String, valueCol: String, k: Int,
      tieCols: Seq[String]): DataFrame = {
    require(k >= 2, s"need at least 2 bins: $k")
    require(tieCols.nonEmpty, "qcutPerGroup needs a tie-break column")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(valueCol) +: tieCols.map(col): _*)
    df.withColumn("bin", ntile(k).over(w))
  }

  /** Catalog-approximate quantile binning — the 100 TB path [[qcut]]'s doc
    * points at: the k−1 bin BOUNDARIES fold from the lake manifest's GK
    * quantile sketches with ZERO scan jobs, and the binning itself is one
    * narrow codegen'd pass (a chained CASE against broadcast literal
    * boundaries) — no global sort, no shuffle, cost one scan of the one
    * column. The trade: bin populations are equal only within the GK rank
    * bound (each boundary's true rank is within 2ε + 2/n of its target —
    * the same certificate `metaApproxQuantile` carries), where [[qcut]]'s
    * total sort makes them exact. Refuses loudly when the catalog cannot
    * vouch tight sketches for the column (run ANALYZE, or pay the exact
    * path) — approximate deciles from a stale sketch would silently skew
    * every stratified decision downstream.
    */
  def qcutApprox(
      ds: graft.lake.LakeDataset, valueCol: String, k: Int): DataFrame = {
    require(k >= 2, s"need at least 2 bins: $k")
    val qs = (1 until k).map(_.toDouble / k)
    val bounds = ds.metaApproxQuantile(Seq(valueCol), qs)
      .getOrElse(throw new IllegalStateException(
        s"catalog cannot vouch tight quantile sketches for '$valueCol' — " +
          "ANALYZE the table or use the exact qcut"))(valueCol)
    val bin = bounds.zipWithIndex.foldRight(lit(k): Column) {
      case ((b, i), acc) => when(col(valueCol) <= lit(b), lit(i + 1)).otherwise(acc)
    }
    ds.toDF.withColumn("bin", bin)
  }

  // ------------------------------------------------------------ constraints

  /** One verifiable expectation over a table. `name` keys the report row. */
  sealed trait Constraint { def name: String }

  /** Column must never be NULL. Row-local. */
  final case class NotNull(column: String) extends Constraint {
    def name = s"not_null($column)"
  }

  /** Numeric column must lie in [lo, hi] (NULLs don't violate — pair with
    * [[NotNull]] for that). Row-local.
    */
  final case class InRange(column: String, lo: Double, hi: Double) extends Constraint {
    def name = s"in_range($column)"
  }

  /** String column must fully match the regex (NULLs don't violate). */
  final case class MatchesRegex(column: String, regex: String) extends Constraint {
    def name = s"matches_regex($column)"
  }

  /** String column's values must come from the allowed set. */
  final case class IsIn(column: String, allowed: Seq[String]) extends Constraint {
    def name = s"is_in($column)"
  }

  /** Arbitrary row predicate (violation = rows where it is false/null). */
  final case class Satisfies(name: String, predicate: Column) extends Constraint

  /** The key must identify rows uniquely (violations = rows in excess of
    * one per key, the count a dedup would remove). One groupBy shuffle.
    */
  final case class Unique(columns: Seq[String]) extends Constraint {
    def name = s"unique(${columns.mkString(",")})"
  }

  /** Every non-null FK value must exist in the referenced column
    * (violations = rows whose FK misses). One anti-join; the referenced
    * side is broadcast when it is dimension-sized.
    */
  final case class RefIntegrity(
      column: String, ref: DataFrame, refColumn: String,
      broadcastRef: Boolean = true) extends Constraint {
    def name = s"ref_integrity($column)"
  }

  /** Run a constraint suite. Report: one row per constraint —
    * `(constraint, n_rows, n_violations, passed)` — deterministic order
    * (suite order). All row-local constraints share ONE aggregate scan;
    * each Unique/RefIntegrity adds its one shuffle. The per-constraint
    * results are unioned as single-row frames (k-sized, not data-sized).
    */
  /** Per-row violation predicates of the ROW-LOCAL constraints. */
  private def rowViolations(constraints: Seq[Constraint]): Seq[(String, Column)] =
    constraints.collect {
      case c: NotNull => c.name -> col(c.column).isNull
      case c: InRange =>
        c.name -> (col(c.column).isNotNull &&
          !col(c.column).cast("double").between(c.lo, c.hi))
      case c: MatchesRegex =>
        c.name -> (col(c.column).isNotNull && !col(c.column).rlike(c.regex))
      case c: IsIn =>
        c.name -> (col(c.column).isNotNull && !col(c.column).isin(c.allowed: _*))
      case c: Satisfies => c.name -> !coalesce(c.predicate, lit(false))
    }

  def check(df: DataFrame, constraints: Seq[Constraint]): DataFrame = {
    val spark = df.sparkSession
    val rowLocal = rowViolations(constraints)
    val localReport: Option[DataFrame] =
      if (rowLocal.isEmpty) None
      else {
        val aggs = rowLocal.map { case (n, viol) =>
          sum(when(viol, 1L).otherwise(0L)).as(n)
        }
        val wide = df.agg(count(lit(1)).as("__rows"), aggs: _*)
        val rows = rowLocal.map { case (n, _) =>
          struct(lit(n).as("constraint"), col("__rows").as("n_rows"),
            coalesce(col(s"`$n`"), lit(0L)).as("n_violations"))
        }
        Some(wide.select(explode(array(rows: _*)).as("r")).select("r.*"))
      }
    val heavies: Seq[DataFrame] = constraints.collect {
      case c: Unique =>
        val keys = c.columns.map(col)
        df.groupBy(keys: _*).agg(count(lit(1)).as("__n"))
          .agg(coalesce(sum(col("__n") - 1), lit(0L)).as("n_violations"),
            coalesce(sum("__n"), lit(0L)).as("n_rows"))
          .select(lit(c.name).as("constraint"), col("n_rows"), col("n_violations"))
      case c: RefIntegrity =>
        // ONE pass: left-outer against the (distinct, usually broadcast)
        // reference keys, counting rows and unmatched non-null values in
        // the same aggregate — no second scan, no 1x1 cross join of two
        // aggregate rows (which physical-plans as a nested-loop join).
        val refSide0 = c.ref.select(col(c.refColumn).as("__ref")).distinct()
        val refSide = if (c.broadcastRef) broadcast(refSide0) else refSide0
        df.join(refSide, col(c.column) === col("__ref"), "left_outer")
          .agg(count(lit(1)).as("n_rows"),
            coalesce(sum(when(col(c.column).isNotNull && col("__ref").isNull, 1L)
              .otherwise(0L)), lit(0L)).as("n_violations"))
          .select(lit(c.name).as("constraint"), col("n_rows"), col("n_violations"))
    }
    val pieces = localReport.toSeq ++ heavies
    val all = pieces.reduce(_ unionByName _)
    // Restore suite order (the local block floated its members together).
    val order = constraints.map(_.name).zipWithIndex.toMap
    val orderUdf = map(order.toSeq.flatMap { case (n, i) =>
      Seq(lit(n), lit(i))
    }: _*)
    all
      .withColumn("__ord", element_at(orderUdf, col("constraint")))
      .orderBy("__ord")
      .select(col("constraint"), col("n_rows"), col("n_violations"),
        (col("n_violations") === 0L).as("passed"))
  }

  /** Tag every row with the names of the constraints it violates
    * (`__violations` array column, empty = clean). Row-local constraints
    * evaluate inline; [[RefIntegrity]] marks rows via a (broadcast)
    * left join against the distinct reference keys — still one pass over
    * `df`. Set-level [[Unique]] is rejected: "which duplicate is the
    * violation" is a policy, not a row property — run
    * [[Dedup.keepFirst]] first.
    */
  def validate(df: DataFrame, constraints: Seq[Constraint]): DataFrame = {
    require(!constraints.exists(_.isInstanceOf[Unique]),
      "Unique is set-level - dedup first (Dedup.keepFirst), then validate")
    val refs = constraints.collect { case c: RefIntegrity => c }
    val withRefs = refs.zipWithIndex.foldLeft(df) { case (d, (c, i)) =>
      val refSide0 = c.ref.select(col(c.refColumn).as(s"__ref_$i")).distinct()
      val refSide = if (c.broadcastRef) broadcast(refSide0) else refSide0
      d.join(refSide, col(c.column) === col(s"__ref_$i"), "left_outer")
    }
    val marks: Seq[(String, Column)] = rowViolations(constraints) ++
      refs.zipWithIndex.map { case (c, i) =>
        c.name -> (col(c.column).isNotNull && col(s"__ref_$i").isNull)
      }
    val tagged = withRefs.withColumn("__violations",
      filter(array(marks.map { case (n, viol) =>
        when(viol, lit(n)).otherwise(lit(null).cast("string"))
      }: _*), v => v.isNotNull))
    tagged.drop(refs.indices.map(i => s"__ref_$i"): _*)
  }

  /** Validated ingest — the data-contract gate at the table boundary:
    * rows passing every constraint insert into the lake; violating rows
    * are RETURNED (with their `__violations` tags) for the caller to
    * quarantine, never silently dropped and never poisoning the table.
    * The tagged batch is snapshotted once, so accept and quarantine split
    * one evaluation, and the returned frame stays valid after the insert
    * consumes its half.
    */
  def insertValidated(ds: graft.lake.LakeDataset, df: DataFrame,
      constraints: Seq[Constraint]): DataFrame = {
    val tagged = validate(df, constraints).localCheckpoint(true)
    ds.insert(tagged.filter(size(col("__violations")) === 0).drop("__violations"))
    tagged.filter(size(col("__violations")) > 0)
  }
}
