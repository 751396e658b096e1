package graft

import graft.functions.ZOrderKey
import graft.operators.Clustering
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class ClusteringSpec extends SparkSpec {

  private def leafCount(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.collectLeaves().size

  test("zorder rank: binary search, duplicate cut runs, null and NaN placement") {
    val cuts = Array(1.0, 2.0, 2.0, 2.0, 5.0, 8.0, 9.0) // bits=3 -> 7 cuts
    assert(ZOrderKey.rank(cuts, 0.5) == 0)
    assert(ZOrderKey.rank(cuts, 1.0) == 1)
    assert(ZOrderKey.rank(cuts, 1.5) == 1)
    // a probe equal to a duplicated cut gets ONE deterministic rank: the
    // upper edge of the equal run
    assert(ZOrderKey.rank(cuts, 2.0) == 4)
    assert(ZOrderKey.rank(cuts, 4.9) == 4)
    assert(ZOrderKey.rank(cuts, 9.0) == 7)
    assert(ZOrderKey.rank(cuts, 100.0) == 7)
    assert(ZOrderKey.rank(cuts, Double.NaN) == 7) // NaN sorts last
  }

  test("zorder spread: bit i of column j lands at i*ncols + j") {
    // 2 cols, 3 bits: rank 0b101 of col 0 -> bits 0 and 4
    assert(ZOrderKey.spread(5, 0, 2, 3) == ((1L << 0) | (1L << 4)))
    // same rank of col 1 -> bits 1 and 5
    assert(ZOrderKey.spread(5, 1, 2, 3) == ((1L << 1) | (1L << 5)))
    // interleaving two full ranks fills alternating bits
    assert((ZOrderKey.spread(7, 0, 2, 3) | ZOrderKey.spread(7, 1, 2, 3)) == 0x3FL)
  }

  test("zorder key expression: codegen equals scala-side model; null ranks 0") {
    import spark.implicits._
    val bits = 3
    val cuts = Array(10.0, 20.0, 30.0, 40.0, 50.0, 60.0, 70.0)
    val bounds = Array(cuts, cuts)
    val rows = Seq[(java.lang.Double, java.lang.Double)](
      (5.0, 65.0), (25.0, 25.0), (null, 45.0), (75.0, null), (40.0, 40.0))
    val df = rows.toDF("a", "b")
    val got = df.select(ZOrderKey(Seq(col("a"), col("b")), bounds, bits).as("z"))
      .as[Long].collect().toSeq
    val want = rows.map { case (a, b) =>
      val ra = if (a == null) 0 else ZOrderKey.rank(cuts, a)
      val rb = if (b == null) 0 else ZOrderKey.rank(cuts, b)
      ZOrderKey.spread(ra, 0, 2, bits) | ZOrderKey.spread(rb, 1, 2, bits)
    }
    assert(got == want)
  }

  test("zorder lake: pruning keeps few bins on EITHER dimension; results exact") {
    val o = Fixtures.table(spark, sf(), "orders")
    val ds = Clustering.zorderLake(spark, o,
      Seq("o_custkey", "o_totalprice"), bits = 6, nBins = 16).dataset
    val total = ds.numParts
    assert(total > 8, s"expected most of 16 bins populated, got $total")

    // Narrow range on each dimension separately: BOTH must prune — the
    // z-order property a single-column sort cannot give.
    val keptCust = leafCount(ds.prunedByConstraints(Map.empty,
      Map("o_custkey" -> (Some(100L), Some(300L)))))
    val keptPrice = leafCount(ds.prunedByConstraints(Map.empty,
      Map("o_totalprice" -> (Some(100000.0), Some(120000.0)))))
    assert(keptCust < total, s"custkey range kept all $total bins")
    assert(keptPrice < total, s"totalprice range kept all $total bins")

    // Correctness: pruned scan + residual filter == plain filter on the source.
    val exact = o.filter(col("o_custkey").between(100L, 300L) &&
        col("o_totalprice").between(50000.0, 150000.0))
      .agg(count(lit(1)), sum(col("o_totalprice").cast("decimal(38,2)")))
      .collect()(0)
    val got = ds.prunedByConstraints(Map.empty, Map(
        "o_custkey" -> (Some(100L), Some(300L)),
        "o_totalprice" -> (Some(50000.0), Some(150000.0))))
      .filter(col("o_custkey").between(100L, 300L) &&
        col("o_totalprice").between(50000.0, 150000.0))
      .agg(count(lit(1)), sum(col("o_totalprice").cast("decimal(38,2)")))
      .collect()(0)
    assert(got == exact)
  }

  test("zorder pruning reaches the SQL surface through LakePruneRule") {
    val o = Fixtures.table(spark, sf(), "orders")
    val ds = Clustering.zorderLake(spark, o,
      Seq("o_custkey", "o_totalprice"), bits = 6, nBins = 16).dataset
    val db = new graft.lake.Database(spark)
    db.register("orders_zorder", ds)
    val q = spark.sql(
      """SELECT COUNT(*) AS n FROM orders_zorder
        |WHERE o_totalprice BETWEEN 100000 AND 120000""".stripMargin)
    // the rule must plan fewer bins than the table holds — from a range on a
    // column that is NOT the partition axis (that's what z-order bought)
    assert(leafCount(q) < ds.numParts, q.queryExecution.optimizedPlan.treeString)
    assert(q.head().getLong(0) ==
      o.filter(col("o_totalprice").between(100000.0, 120000.0)).count())
  }

  test("zorder ingest routes later batches through the build-time recipe") {
    val o = Fixtures.table(spark, sf(), "orders")
    val build = o.filter(col("o_orderkey") % 2 === 0)
    val late = o.filter(col("o_orderkey") % 2 =!= 0)
    val zlake = Clustering.zorderLake(spark, build,
      Seq("o_custkey", "o_totalprice"), bits = 6, nBins = 16)
    val before = zlake.dataset.numParts
    zlake.insert(late)
    // no new bins appear: the recipe routes rows into the existing regions
    assert(zlake.dataset.numParts == before,
      s"ingest created bins: $before -> ${zlake.dataset.numParts}")
    // pruning still selective and results exact over the combined contents
    val ranges = Map[String, (Option[Any], Option[Any])](
      "o_totalprice" -> (Some(100000.0), Some(120000.0)))
    assert(leafCount(zlake.dataset.prunedByConstraints(Map.empty, ranges))
      < zlake.dataset.numParts)
    val got = zlake.dataset.prunedByConstraints(Map.empty, ranges)
      .filter(col("o_totalprice").between(100000.0, 120000.0)).count()
    assert(got == o.filter(col("o_totalprice").between(100000.0, 120000.0)).count())
  }

  test("drift monitor fires on boundary-blind inserts; relayout restores pruning") {
    val o = Fixtures.table(spark, sf(), "orders")
    val zlake = Clustering.zorderLake(spark, o,
      Seq("o_custkey", "o_totalprice"), bits = 6, nBins = 16)
    // In-distribution ingest: spreads across bins, no drift signal.
    zlake.insert(o.limit(100))
    assert(!zlake.drifted(), s"uniform ingest flagged: ${zlake.driftScore()}")

    // Drifted stream: custkey/totalprice far beyond the build quantiles —
    // every row ranks into the top edge bins. Ingest stays correct and
    // pruning stays SOUND, but the hot bins' zones widen; the monitor must
    // say so.
    val drifted = o.limit(200)
      .withColumn("o_orderkey", col("o_orderkey") + 1000000L)
      .withColumn("o_custkey", col("o_custkey") + 100000L)
      .withColumn("o_totalprice", col("o_totalprice") + 10000000.0)
    zlake.insert(drifted)
    assert(zlake.drifted(), s"drift not flagged: ${zlake.driftScore()}")

    // Rebuild: fresh boundaries over the CURRENT contents — the drifted
    // values get their own quantile range, the monitor resets, and a range
    // query INSIDE the drifted region prunes again.
    val rebuilt = zlake.relayout(spark)
    assert(!rebuilt.drifted())
    assert(rebuilt.dataset.toDF.count() == zlake.dataset.toDF.count())
    val ranges = Map[String, (Option[Any], Option[Any])](
      "o_custkey" -> (Some(100100L), Some(100300L)))
    assert(leafCount(rebuilt.dataset.prunedByConstraints(Map.empty, ranges))
      < rebuilt.dataset.numParts,
      "post-relayout range query over the drifted region must prune")
    val got = rebuilt.dataset.prunedByConstraints(Map.empty, ranges)
      .filter(col("o_custkey").between(100100L, 100300L)).count()
    val want = zlake.dataset.toDF
      .filter(col("o_custkey").between(100100L, 100300L)).count()
    assert(got == want && want > 0L)
  }

  test("zorder lake survives a storage round trip with pruning intact") {
    val o = Fixtures.table(spark, sf(), "orders")
    val root = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    try {
      val ds = Clustering.zorderLake(spark, o,
        Seq("o_custkey", "o_totalprice"), bits = 6, nBins = 16,
        storage = Some(graft.model.StorageSpec(root))).dataset
      ds.toStorage()
      val back = graft.lake.LakeDataset.fromStorage(spark, root)
      val ranges = Map[String, (Option[Any], Option[Any])](
        "o_totalprice" -> (Some(100000.0), Some(120000.0)))
      assert(leafCount(back.prunedByConstraints(Map.empty, ranges)) < back.numParts,
        "reloaded zone stats must still prune")
      val exact = o.filter(col("o_totalprice").between(100000.0, 120000.0)).count()
      val got = back.prunedByConstraints(Map.empty, ranges)
        .filter(col("o_totalprice").between(100000.0, 120000.0)).count()
      assert(got == exact)
    } finally graft.lake.LakeDataset.deleteRecursively(java.nio.file.Paths.get(root))
  }
}
