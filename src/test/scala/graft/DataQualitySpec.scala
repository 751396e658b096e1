package graft

import org.apache.spark.sql.functions._

import graft.operators.DataQuality
import graft.operators.DataQuality._

class DataQualitySpec extends SparkSpec {
  import spark.implicits._

  private def fixture = Seq(
    (1L, Some("a@x.com"), Some(10.0), "URGENT"),
    (2L, None, Some(-5.0), "LOW"),
    (2L, Some("b@y.org"), Some(200.0), "urgent"),
    (3L, Some("not-an-email"), None, "LOW"),
    (4L, Some("c@z.io"), Some(50.0), "MEDIUM")
  ).toDF("id", "email", "amount", "prio")

  test("profile computes every column's stats in one scan") {
    val p = DataQuality.profile(fixture, Seq("id", "email", "amount")).collect()
      .map(r => r.getAs[String]("column") ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("n_nulls"),
         r.getAs[Long]("n_distinct"))).toMap
    assert(p("id") == ((5L, 0L, 4L)))
    assert(p("email") == ((5L, 1L, 4L)))
    assert(p("amount") == ((5L, 1L, 4L)))
    val amount = DataQuality.profile(fixture, Seq("amount"))
      .filter($"column" === "amount").head()
    assert(amount.getAs[Long]("min_long") == -5L)
    assert(amount.getAs[Long]("max_long") == 200L)
    // Non-numeric: min/max stay NULL rather than changing the report type.
    val email = DataQuality.profile(fixture, Seq("email")).head()
    assert(email.isNullAt(email.fieldIndex("min_long")))
  }

  test("profile is one job: single scan leaf for many columns") {
    val plan = DataQuality.profile(fixture, Seq("id", "email", "amount", "prio"))
      .queryExecution.optimizedPlan
    val leaves = plan.collectLeaves().size
    assert(leaves == 1, s"profile must not re-scan per column, got $leaves leaves")
  }

  test("constraint suite reports exact violation counts in suite order") {
    val dim = Seq(1L, 2L, 3L).toDF("k")
    val report = DataQuality.check(fixture, Seq(
      NotNull("email"),
      InRange("amount", 0.0, 100.0),
      MatchesRegex("email", "^[^@]+@[^@]+\\.[a-z]+$"),
      IsIn("prio", Seq("URGENT", "MEDIUM", "LOW")),
      Unique(Seq("id")),
      RefIntegrity("id", dim, "k"),
      Satisfies("amount_covers_id", $"amount" >= $"id")
    )).collect().map(r =>
      (r.getAs[String]("constraint"), r.getAs[Long]("n_rows"),
       r.getAs[Long]("n_violations"), r.getAs[Boolean]("passed")))
    assert(report.map(_._1).toSeq == Seq(
      "not_null(email)", "in_range(amount)", "matches_regex(email)",
      "is_in(prio)", "unique(id)", "ref_integrity(id)", "amount_covers_id"))
    val byName = report.map(r => r._1 -> r).toMap
    assert(byName("not_null(email)")._3 == 1L)        // row 2
    assert(byName("in_range(amount)")._3 == 2L)       // -5, 200
    assert(byName("matches_regex(email)")._3 == 1L)   // not-an-email
    assert(byName("is_in(prio)")._3 == 1L)            // "urgent"
    assert(byName("unique(id)")._3 == 1L)             // id=2 twice
    assert(byName("ref_integrity(id)")._3 == 1L)      // id=4
    assert(byName("amount_covers_id")._3 == 2L)       // null amount + (-5 < 2)
    assert(report.forall(_._2 == 5L))
    assert(report.count(_._4) == 0)
  }

  test("row-local constraints share one scan; all-green suite passes") {
    val suite = Seq(NotNull("id"), InRange("amount", -10.0, 1000.0),
      IsIn("prio", Seq("URGENT", "MEDIUM", "LOW", "urgent")))
    val report = DataQuality.check(fixture, suite)
    val leaves = report.queryExecution.optimizedPlan.collectLeaves().size
    assert(leaves == 1, s"row-local suite must be one scan, got $leaves leaves")
    assert(report.collect().forall(_.getAs[Boolean]("passed")))
  }

  test("histogramDrift: hand-computed bins, clamped tails, exact TVD numerators") {
    import spark.implicits._
    // width 50, 3 bins: 5→0, 55→1, 105→2, 9999→2 (clamped into the last
    // bin, not dropped). after: 5→0, 5→0, 200→2.
    val before = Seq(5L, 55L, 105L, 9999L).toDF("v")
    val after = Seq(5L, 5L, 200L).toDF("v")
    val raw = DataQuality.histogramDrift(before, after, col("v"), 50L, 3)
    // dev is Decimal(38,0): a bin numerator reaches N_before·N_after,
    // which wraps a 64-bit product past ~9.2e18 row-products — the
    // 1e12-row-table × 1e7-row-batch regime the drift gate guards.
    assert(raw.schema("dev").dataType ==
      org.apache.spark.sql.types.DecimalType(38, 0))
    val got = raw.withColumn("dev", col("dev").cast("long"))
      .orderBy("bin")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // dev = |n_before·N_after − n_after·N_before| with N_before=4, N_after=3.
    assert(got == Seq((0L, 1L, 2L, 5L), (1L, 1L, 0L, 3L), (2L, 2L, 1L, 2L)))
    // Σdev/(2·Na·Nb) is the total-variation distance: 10/24 = 5/12.
    assert(got.map(_._4).sum == 10L)
    // Identical snapshots drift zero in every bin.
    val same = DataQuality.histogramDrift(before, before, col("v"), 50L, 3)
      .agg(sum("dev").cast("long")).head().getLong(0)
    assert(same == 0L)
  }

  test("empty table: zero rows, zero violations, everything passes") {
    val empty = fixture.limit(0)
    val report = DataQuality.check(empty,
      Seq(NotNull("email"), Unique(Seq("id")))).collect()
    assert(report.forall(r => r.getAs[Long]("n_rows") == 0L &&
      r.getAs[Long]("n_violations") == 0L && r.getAs[Boolean]("passed")))
  }

  test("qcut: balanced bins, ordered boundaries, deterministic under ties") {
    import spark.implicits._
    // 23 rows into 5 bins: first 23%5=3 bins get 5 rows, the rest 4.
    val df = (1 to 23).map(i => (i.toLong, (i * 7) % 10)).toDF("id", "v")
    val binned = DataQuality.qcut(df, "v", 5, Seq("id"))
    val sizes = binned.groupBy("bin").count().orderBy("bin")
      .as[(Int, Long)].collect()
    assert(sizes.map(_._1) === (1 to 5).toArray)
    assert(sizes.map(_._2) === Array(5L, 5L, 5L, 4L, 4L))
    // Bins respect the total (v, id) order: no row in bin k+1 sorts before
    // a row in bin k.
    val rows = binned.select($"bin", $"v", $"id").as[(Int, Int, Long)]
      .collect().sortBy(r => (r._2, r._3))
    assert(rows.map(_._1).toSeq === rows.map(_._1).toSeq.sorted)
    // Ties straddle boundaries deterministically: rerun and a repartitioned
    // run assign identical bins.
    val again = DataQuality.qcut(df.repartition(7), "v", 5, Seq("id"))
      .select("id", "bin").as[(Long, Int)].collect().toMap
    val first = binned.select("id", "bin").as[(Long, Int)].collect().toMap
    assert(again === first)
  }

  test("qcutApprox: catalog boundaries bin within the GK rank bound; refuses untracked") {
    import spark.implicits._
    val n = 4000
    val df = (1 to n).map(i => (i.toLong, ((i * 2654435761L) % 100000).toDouble))
      .toDF("id", "v")
    val ds = graft.lake.LakeDataset.fromDataFrame(spark, df,
      quantileCols = Seq("v"))
    val k = 5
    val shares = graft.operators.DataQuality.qcutApprox(ds, "v", k)
      .groupBy("bin").count().orderBy("bin")
      .as[(Int, Long)].collect()
    assert(shares.map(_._1) === (1 to k).toArray, "every bin must be populated")
    val bnd = 2 * (2 * graft.lake.QuantileMap.Eps + 2.0 / n)
    shares.foreach { case (b, c) =>
      assert(math.abs(c.toDouble / n - 1.0 / k) <= bnd,
        s"bin $b share ${c.toDouble / n} off target beyond the rank bound")
    }
    // Zero scan jobs for the boundaries themselves: metaApproxQuantile is
    // catalog state (pinned by QuantileStatsSpec); here pin the refusal.
    val untracked = graft.lake.LakeDataset.fromDataFrame(spark, df)
    val e = intercept[IllegalStateException] {
      graft.operators.DataQuality.qcutApprox(untracked, "v", k)
    }
    assert(e.getMessage.contains("ANALYZE"), e.getMessage)
  }

  test("qcut: matches ntile exactly on randomized data, without the single-partition sort") {
    import spark.implicits._
    val rnd = new scala.util.Random(19)
    // sizes chosen so n % k != 0 exercises the front-loaded split
    for ((n, k) <- Seq((997, 7), (1000, 10), (53, 8))) {
      val df = (1 to n).map(i => (i.toLong, rnd.nextInt(40))).toDF("id", "v")
        .repartition(11)
      val got = DataQuality.qcut(df, "v", k, Seq("id"))
        .select("id", "bin").as[(Long, Int)].collect().toMap
      // ground truth: the single-partition ntile this operator replaces
      val truth = df.withColumn("bin", org.apache.spark.sql.functions.ntile(k)
          .over(org.apache.spark.sql.expressions.Window.orderBy($"v", $"id")))
        .select("id", "bin").as[(Long, Int)].collect().toMap
      assert(got === truth, s"n=$n k=$k")
    }
    // Plan pin: the data path is a range-partitioned sort — no ntile, and
    // the only SinglePartition exchange feeds the <= P-row offsets frame,
    // whose input is an aggregate, never the raw data.
    val big = (1 to 1000).map(i => (i.toLong, i % 40)).toDF("id", "v")
    val plan = DataQuality.qcut(big, "v", 10, Seq("id"))
      .queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("ntile"), plan.take(2000))
    assert(plan.toLowerCase.contains("rangepartitioning"), plan.take(2000))
  }

  test("qcut: ONE reused range exchange, no second data-sized shuffle") {
    import spark.implicits._
    // Execute, then read the FINAL adaptive plan: the offsets branch must
    // reuse the rank branch's range shuffle (one sampled boundary set) —
    // a second independent range exchange would re-sample its boundaries
    // and could disagree on row placement. And the rank must come from the
    // sorted-partition id encoding, not a window: `row_number() over
    // (partition by pid)` would add a second DATA-sized hash exchange.
    val df = (1 to 500).map(i => (i.toLong, i % 23)).toDF("id", "v")
    val q = DataQuality.qcut(df, "v", 8, Seq("id"))
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val ranges = plan.linesIterator
      .filter(l => l.contains("Exchange rangepartitioning") &&
        !l.contains("ReusedExchange")).size
    assert(ranges == 1, s"expected ONE range exchange:\n${plan.take(3000)}")
    assert(plan.contains("ReusedExchange"), plan.take(3000))
    assert(!plan.contains("row_number"), plan.take(3000))
  }

  test("qcut: refuses loudly when exchange reuse is disabled") {
    import spark.implicits._
    val df = Seq((1L, 1), (2L, 2)).toDF("id", "v")
    spark.conf.set("spark.sql.exchange.reuse", "false")
    try {
      val e = intercept[IllegalArgumentException] {
        DataQuality.qcut(df, "v", 2, Seq("id"))
      }
      assert(e.getMessage.contains("exchange.reuse"))
    } finally spark.conf.set("spark.sql.exchange.reuse", "true")
  }

  test("qcutPerGroup: per-stratum ntile, group-partitioned, no single-partition move") {
    import spark.implicits._
    val df = (1 to 300).map(i => (i.toLong, "g" + i % 3, i * 7 % 97))
      .toDF("id", "g", "v")
    val out = DataQuality.qcutPerGroup(df, "g", "v", 4, Seq("id"))
    // Every stratum's bins are balanced within 1 row.
    val counts = out.groupBy("g", "bin").count().select("count").as[Long].collect()
    assert(counts.length == 12 && counts.max - counts.min <= 1)
    // Bit-equality with the window truth.
    val truth = df.withColumn("bin", ntile(4).over(
      org.apache.spark.sql.expressions.Window.partitionBy($"g").orderBy($"v", $"id")))
    assert(out.orderBy("id").collect() === truth.orderBy("id").collect())
    // The data moves through hashpartitioning(g) only — no SinglePartition.
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(g"), plan.take(2000))
    assert(!plan.contains("SinglePartition"), plan.take(2000))
  }

  test("qcut: more bins than rows degrades to one row per bin") {
    import spark.implicits._
    val df = Seq((1L, 10), (2L, 20), (3L, 30)).toDF("id", "v")
    val bins = DataQuality.qcut(df, "v", 10, Seq("id"))
      .orderBy("v").select("bin").as[Int].collect()
    assert(bins === Array(1, 2, 3))
  }
}
