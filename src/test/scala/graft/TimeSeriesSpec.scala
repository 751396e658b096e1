package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.TimeSeries

/** Hand-computed ground truths for the time-series toolkit: grid rendering,
  * fill semantics at the series edges, exact floor-division interpolation
  * (floor, NOT truncation — the negative-slope case distinguishes them),
  * and partitioning independence.
  */
class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Int): Timestamp = Timestamp.valueOf(f"2024-01-${day}%02d 00:00:00")

  private def series(rows: (Long, Int, java.lang.Long)*): DataFrame =
    rows.map { case (k, d, v) => (k, ts(d), v) }.toDF("k", "day", "v")

  test("upsample renders a dense inclusive per-key grid with null gaps") {
    val df = series((1L, 1, 10L), (1L, 3, 30L), (1L, 6, 60L), (2L, 4, 40L))
    val up = TimeSeries.upsample(df, "k", "day", 86400L)
      .select($"k", $"day", $"v").as[(Long, Timestamp, Option[Long])]
      .collect().sortBy(r => (r._1, r._2.getTime))
    // key 1 spans days 1..6 (6 ticks); key 2 is a single tick.
    assert(up.map(r => (r._1, r._2)) === Array(
      (1L, ts(1)), (1L, ts(2)), (1L, ts(3)), (1L, ts(4)), (1L, ts(5)), (1L, ts(6)),
      (2L, ts(4))))
    assert(up.map(_._3) === Array(
      Some(10L), None, Some(30L), None, None, Some(60L), Some(40L)))
  }

  test("upsample predicts the worst key and refuses an exploding grid") {
    val df = series((7L, 1, 1L), (7L, 30, 2L))
    val e = intercept[IllegalArgumentException] {
      TimeSeries.upsample(df, "k", "day", 1L, maxTicksPerKey = 1000L)
    }
    assert(e.getMessage.contains("key 7"), e.getMessage)
    assert(e.getMessage.contains("ticks"), e.getMessage)
    // The same span is fine on a grid the cap admits.
    assert(TimeSeries.upsample(df, "k", "day", 86400L, maxTicksPerKey = 1000L)
      .count() === 30L)
  }

  test("fillForward holds the last observation; leading nulls stay null") {
    val up = TimeSeries.upsample(
      series((1L, 1, 10L), (1L, 4, 40L), (2L, 2, 2L), (2L, 5, 5L)),
      "k", "day", 86400L)
    // Erase key 2's first observation to manufacture a leading null.
    val gappy = up.withColumn("v",
      when($"k" === 2 && $"day" === lit(ts(2)), lit(null: java.lang.Long))
        .otherwise($"v"))
    val filled = TimeSeries.fillForward(gappy, "k", "day", Seq("v"))
      .select($"k", $"day", $"v").as[(Long, Timestamp, Option[Long])]
      .collect().sortBy(r => (r._1, r._2.getTime))
    assert(filled.map(_._3) === Array(
      Some(10L), Some(10L), Some(10L), Some(40L), // key 1: held through the gap
      None, None, None, Some(5L)))                // key 2: nothing to hold yet
  }

  test("interpolateLinear: exact grid, floor (not truncation) on negative slopes") {
    val up = TimeSeries.upsample(
      series((1L, 1, 100L), (1L, 5, 300L),   // even spacing: 150/200/250
        (2L, 1, 0L), (2L, 4, 10L),           // non-divisible: floor(10/3)=3, floor(20/3)=6
        (3L, 1, 10L), (3L, 4, 0L)),          // negative slope: 10+floor(-10/3) = 6 (trunc would say 7)
      "k", "day", 86400L)
    val interp = TimeSeries.interpolateLinear(up, "k", "day", "v")
      .select($"k", $"day", $"v").as[(Long, Timestamp, Option[Long])]
      .collect().sortBy(r => (r._1, r._2.getTime))
    assert(interp.filter(_._1 == 1L).map(_._3) ===
      Array(Some(100L), Some(150L), Some(200L), Some(250L), Some(300L)))
    assert(interp.filter(_._1 == 2L).map(_._3) ===
      Array(Some(0L), Some(3L), Some(6L), Some(10L)))
    assert(interp.filter(_._1 == 3L).map(_._3) ===
      Array(Some(10L), Some(6L), Some(3L), Some(0L)))
  }

  test("interpolateLinear leaves leading/trailing nulls null (polars parity)") {
    val df = Seq(
      (1L, ts(1), null: java.lang.Long),
      (1L, ts(2), java.lang.Long.valueOf(10L)),
      (1L, ts(3), null: java.lang.Long),
      (1L, ts(4), java.lang.Long.valueOf(20L)),
      (1L, ts(5), null: java.lang.Long)).toDF("k", "day", "v")
    val interp = TimeSeries.interpolateLinear(df, "k", "day", "v")
      .select($"v").as[Option[Long]].collect()
    assert(interp.sorted === Array(None, None, Some(10L), Some(15L), Some(20L)).sorted)
    assert(TimeSeries.interpolateLinear(df, "k", "day", "v")
      .orderBy("day").select($"v").as[Option[Long]].collect() ===
      Array(None, Some(10L), Some(15L), Some(20L), None))
  }

  test("diffPct: lagged diff and floor-division basis points") {
    val out = TimeSeries.diffPct(
        series((1L, 1, 100L), (1L, 2, 150L), (1L, 3, 120L)),
        "k", "day", "v")
      .orderBy("day")
      .select($"diff", $"pct_bps").as[(Option[Long], Option[Long])].collect()
    assert(out === Array(
      (None, None),
      (Some(50L), Some(5000L)),
      (Some(-30L), Some(-2000L))))  // floor(-300000/150) — exact here
    // Domain guard: a diff past Long.MaxValue/10^4 must fail LOUDLY, never
    // compute wrapped. Under ANSI (the Spark 4 default) the multiply's own
    // ARITHMETIC_OVERFLOW fires; with ANSI off the per-row assert_true
    // ("rescale") catches the same rows — either way, no silent wrap.
    val big = intercept[Exception] {
      TimeSeries.diffPct(
        series((1L, 1, 1L), (1L, 2, Long.MaxValue / 10000L + 2L)),
        "k", "day", "v").collect()
    }
    def chain(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ chain(x.getCause))
    assert(chain(big).exists(m =>
      m.contains("rescale") || m.contains("ARITHMETIC_OVERFLOW")))
  }

  test("ewmaWindowed: hand-computed integer grid, truncation renormalizes") {
    // α = 1/2, N = 2: weights are (s−a)^k·s^(N−1−k) = [2, 1].
    // x = [10, 20, 40]: t0 = 20/2 = 10 (one present term — renormalized,
    // not biased toward a phantom zero); t1 = (40+10)/3 = 16; t2 = (80+20)/3 = 33.
    val out = TimeSeries.ewmaWindowed(
        series((1L, 1, 10L), (1L, 2, 20L), (1L, 3, 40L)),
        "k", "day", "v", alphaNum = 1, alphaDen = 2, window = 2)
      .orderBy("day").select($"ewma").as[Long].collect()
    assert(out === Array(10L, 16L, 33L))
    // window = 1 degenerates to the identity.
    val id = TimeSeries.ewmaWindowed(
        series((1L, 1, 10L), (1L, 2, 20L)),
        "k", "day", "v", alphaNum = 1, alphaDen = 2, window = 1)
      .orderBy("day").select($"ewma").as[Long].collect()
    assert(id === Array(10L, 20L))
  }

  test("ewmaWindowed: null observations are excluded, not zeroed; overflow guard fires") {
    val df = Seq(
      (1L, ts(1), java.lang.Long.valueOf(10L)),
      (1L, ts(2), null: java.lang.Long),
      (1L, ts(3), java.lang.Long.valueOf(30L))).toDF("k", "day", "v")
    val out = TimeSeries.ewmaWindowed(df, "k", "day", "v",
        alphaNum = 1, alphaDen = 2, window = 2)
      .orderBy("day").select($"ewma").as[Option[Long]].collect()
    // t1's window is [null, 10]: only the k=1 term (weight 1) is present →
    // 10, not 10/3. t2's is [30, null] → 30.
    assert(out === Array(Some(10L), Some(10L), Some(30L)))
    val e = intercept[IllegalArgumentException] {
      TimeSeries.ewmaWindowed(df, "k", "day", "v",
        alphaNum = 1, alphaDen = 10, window = 11)
    }
    assert(e.getMessage.contains("overflows"), e.getMessage)
    // advice-r15 case: each single weight fits (10^9 < 2^31) but the SUM of
    // window terms (~6.5e9) times a 2^31-scale value wraps a Long — the
    // guard must bound the weight SUM, not the largest weight.
    val e2 = intercept[IllegalArgumentException] {
      TimeSeries.ewmaWindowed(df, "k", "day", "v",
        alphaNum = 1, alphaDen = 10, window = 10)
    }
    assert(e2.getMessage.contains("overflows"), e2.getMessage)
    // the shipped defaults stay comfortably inside the guard
    TimeSeries.ewmaWindowed(df, "k", "day", "v").collect()
  }

  test("anomalies: hand case — trailing window, constant-window deviation flags") {
    // window=2, k=1: flag ⇔ (2x − S1)² > (2·S2 − S1²) over the 2 PRIOR rows.
    val out = TimeSeries.anomalies(
        series((1L, 1, 10L), (1L, 2, 10L), (1L, 3, 10L), (1L, 4, 25L)),
        "k", "day", "v", window = 2, kNum = 1, kDen = 1)
      .orderBy("day").select($"anomaly").as[Option[Boolean]].collect()
    // t1/t2: < 2 prior observations → NULL (don't-know, not normal).
    // t3: prior [10,10] constant, x on it → no deviation. t4: x=25 off a
    // constant window (σ=0) → any deviation flags.
    assert(out === Array(None, None, Some(false), Some(true)))
  }

  test("anomalies: randomized series matches a BigInt reference; nulls don't count") {
    val rnd = new scala.util.Random(31)
    val rows = for (k <- 1 to 3; d <- 1 to 20) yield {
      val v: java.lang.Long =
        if (rnd.nextInt(7) == 0) null
        else java.lang.Long.valueOf(rnd.nextLong() % 100000L)
      (k.toLong, d, v)
    }
    val (win, kn, kd) = (4, 3, 2)
    val got = TimeSeries.anomalies(series(rows: _*), "k", "day", "v",
        window = win, kNum = kn, kDen = kd)
      .orderBy("k", "day")
      .select($"k", $"day", $"v", $"anomaly")
      .as[(Long, Timestamp, Option[Long], Option[Boolean])].collect().toSeq
    // Reference: same predicate in driver-side BigInt over the sorted
    // series. The rowsBetween frame holds the last `win` PHYSICAL rows
    // (null-valued rows are frame members, excluded from count/sums) —
    // mirror exactly.
    val byKey = rows.groupBy(_._1)
    val want = rows.sortBy(r => (r._1, r._2)).map { case (k, d, v) =>
      val frame = byKey(k).filter(_._2 < d).sortBy(_._2).takeRight(win)
      val xs = frame.flatMap(r => Option(r._3).map(x => BigInt(x.longValue())))
      if (v == null || frame.size < win || xs.size < win) None
      else {
        val s1 = xs.sum; val s2 = xs.map(x => x * x).sum
        val x = BigInt(v.longValue()); val n = BigInt(win)
        val dterm = n * x - s1
        Some(BigInt(kd) * kd * dterm * dterm > BigInt(kn) * kn * (n * s2 - s1 * s1))
      }
    }
    assert(got.map(_._4) === want)
  }

  test("anomalies: overflow guard and runtime domain assert both fire") {
    val df = series((1L, 1, 10L), (1L, 2, 10L), (1L, 3, 10L))
    // Plan-build guard: kn²·2·N²·X² ≥ 10^38 at the default X = 10^15.
    val e = intercept[IllegalArgumentException] {
      TimeSeries.anomalies(df, "k", "day", "v", window = 5, kNum = 2000)
    }
    assert(e.getMessage.contains("Decimal(38,0)"))
    // Runtime assert: a row past maxAbsValue fails loudly on every row,
    // including rows whose own flag is NULL.
    val thrown = intercept[Exception] {
      TimeSeries.anomalies(series((1L, 1, 100L), (1L, 2, 5L)),
        "k", "day", "v", window = 2, kNum = 1, maxAbsValue = 10L)
        .collect()
    }
    assert(thrown.getMessage.contains("maxAbsValue") ||
      Option(thrown.getCause).exists(_.getMessage.contains("maxAbsValue")))
  }

  test("rle collapses runs deterministically under a total order") {
    val df = Seq(
      (1L, 1, "a"), (1L, 2, "a"), (1L, 3, "b"), (1L, 4, "a"), (1L, 5, "a"),
      (2L, 1, "x")).toDF("k", "seq", "state")
    val runs = TimeSeries.rle(df, "k", Seq("seq"), "state")
      .orderBy("k", "run_id")
      .select($"k", $"run_id", $"value", $"run_len", $"run_start")
      .as[(Long, Long, String, Long, Int)].collect()
    assert(runs === Array(
      (1L, 1L, "a", 2L, 1), (1L, 2L, "b", 1L, 3), (1L, 3L, "a", 2L, 4),
      (2L, 1L, "x", 1L, 1)))
    // run lengths partition the input
    assert(runs.map(_._4).sum === df.count())
  }

  test("sessions: gap rule, boundary-exact (gap == threshold stays in-session)") {
    def at(min: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 ${min / 60}%02d:${min % 60}%02d:00")
    val df = Seq(
      (1L, at(0)), (1L, at(10)), (1L, at(40)),  // 30-min gap == threshold: SAME session
      (1L, at(71)),                             // 31-min gap: new session
      (2L, at(5))).toDF("k", "ts")
    val got = TimeSeries.sessions(df, "k", "ts", gapSeconds = 1800L)
      .orderBy("k", "session_id")
      .select($"k", $"session_id", $"n_events").as[(Long, Long, Long)].collect()
    assert(got === Array((1L, 1L, 3L), (1L, 2L, 1L), (2L, 1L, 1L)))
    // Timestamp ties are gap-0: one session regardless of tie order.
    val ties = Seq((1L, at(0)), (1L, at(0)), (1L, at(0))).toDF("k", "ts")
    assert(TimeSeries.sessions(ties, "k", "ts", 1800L).count() === 1L)
  }

  test("upsample→interpolate→ewma over a stored series is ONE exchange") {
    // The design claim of the whole family: no grid join (upsample renders
    // gaps from each row via lead+explode), so every window reuses the one
    // hashpartitioning(key) exchange end to end.
    val tmp = java.nio.file.Files.createTempDirectory("ts_plan").toString
    series((1L, 1, 10L), (1L, 4, 40L), (2L, 2, 7L))
      .write.mode("overwrite").parquet(tmp)
    val stored = spark.read.parquet(tmp)
    val chain = TimeSeries.anomalies(
      TimeSeries.ewmaWindowed(
        TimeSeries.interpolateLinear(
          TimeSeries.upsample(stored, "k", "day", 86400L), "k", "day", "v"),
        "k", "day", "v"),
      "k", "day", "v", window = 2)
    val plan = chain.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges === 1, s"expected exactly one exchange, got $exchanges:\n$plan")
  }

  test("results are partitioning-independent") {
    val base = series((1L, 1, 100L), (1L, 4, 400L), (2L, 2, 7L), (2L, 9, 70L))
    def run(df: DataFrame): Seq[(Long, Timestamp, Option[Long])] =
      TimeSeries.interpolateLinear(
          TimeSeries.upsample(df, "k", "day", 86400L), "k", "day", "v")
        .select($"k", $"day", $"v").as[(Long, Timestamp, Option[Long])]
        .collect().sortBy(r => (r._1, r._2.getTime)).toSeq
    assert(run(base) === run(base.repartition(7)))
  }
}
