package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.functions._

import graft.lake.{Database, HllMap, LakeDataset}

/** HLL distinct-sketch stat family: append-fold exactness (metadata answer
  * == scan answer, bit for bit), mutation invalidation + re-tightening,
  * manifest round trip, and the SQL-surface
  * `hll_sketch_estimate(hll_sketch_agg(c))` → LocalRelation collapse.
  */
class HllStatsSpec extends SparkSpec {

  private def orders: DataFrame =
    spark.read.parquet(s"${sf()}/orders.parquet")

  /** What a real distributed scan prints for the sketch estimate. */
  private def scanEstimate(df: DataFrame, c: String): Long =
    df.agg(hll_sketch_estimate(hll_sketch_agg(col(c), lit(HllMap.LgK))))
      .head().getLong(0)

  private def freshLake(): LakeDataset = {
    val o = orders.withColumn("o_batch", (col("o_orderkey") / 500).cast("int"))
    val ds = LakeDataset.fromDataFrame(spark, o.filter(col("o_orderkey") < 600),
      partitionCols = Seq("o_batch"), sketchCols = Seq("o_custkey"))
    ds.insert(o.filter(col("o_orderkey") >= 600))
    ds
  }

  test("append-folded sketches answer approx-distinct exactly as the scan would") {
    val ds = freshLake()
    // Two insert batches later, the per-part unions still carry the exact
    // registers of a one-shot sketch over everything (union = max).
    val meta = ds.metaApproxDistinct(Seq("o_custkey"))
    assert(meta.isDefined, "pure-append history must stay metadata-answerable")
    assert(meta.get("o_custkey") == scanEstimate(ds.toDF, "o_custkey"))
    // ±2.5% of the true distinct count at lgK=12 — sanity, not the contract.
    val exact = ds.toDF.select(countDistinct(col("o_custkey"))).head().getLong(0)
    assert(math.abs(meta.get("o_custkey") - exact).toDouble / exact < 0.025)
  }

  test("estimator contract at high cardinality: catalog fold == distributed agg") {
    // Past the sparse-exact regime (>> 2^LgK distinct) the two DataSketches
    // estimators can differ: HIP (direct sketch only) vs composite (any
    // union result). The catalog fold and Spark's multi-partial agg BOTH
    // estimate through a union, so they agree even here.
    val n = 300000L
    val df = spark.range(n).toDF("id")
      .withColumn("b", (col("id") % 4).cast("int"))
    val ds = LakeDataset.fromDataFrame(spark, df,
      partitionCols = Seq("b"), sketchCols = Seq("id"))
    val meta = ds.metaApproxDistinct(Seq("id")).get("id")
    assert(meta == scanEstimate(ds.toDF, "id"),
      "catalog fold must equal the distributed (multi-partial) agg estimate")
    // Pure-JVM demonstration of the caveat the docs carry. A union fed a
    // SINGLE sketch adopts it whole — HIP state included — so it still
    // answers the HIP estimate...
    val direct = new org.apache.datasketches.hll.HllSketch(HllMap.LgK)
    (0L until n).foreach(direct.update)
    val hip = Math.round(direct.getEstimate)
    assert(HllMap.unionEstimate(Seq(direct.toUpdatableByteArray)) == hip,
      "a lone-input union must preserve the input's HIP estimate")
    // ...but merging a SECOND stream kills HIP for good: the two-part fold
    // answers the composite estimate, which here diverges from HIP even
    // though the union's registers cover the identical stream. This is the
    // divergence the class doc bounds — both sit within ±2% of the truth.
    val halves = Seq(0L until n / 2, n / 2 until n).map { r =>
      val s = new org.apache.datasketches.hll.HllSketch(HllMap.LgK)
      r.foreach(s.update); s.toUpdatableByteArray
    }
    val composite = HllMap.unionEstimate(halves)
    assert(composite != hip,
      s"expected estimator divergence at n=$n (deterministic input)")
    assert(math.abs(composite - n).toDouble / n < 0.02, s"composite=$composite")
    assert(math.abs(hip - n).toDouble / n < 0.02, s"hip=$hip")
  }

  test("unsketchable declared sketch column is refused at creation") {
    import spark.implicits._
    val df = Seq((1.5, 1L)).toDF("d", "k")
    val e = intercept[IllegalArgumentException](
      LakeDataset.fromDataFrame(spark, df, sketchCols = Seq("d")))
    assert(e.getMessage.contains("sketch column 'd'"), e.getMessage)
    // a column ABSENT from the initial schema stays legal: it may arrive
    // via schema evolution and is tracked from then on
    LakeDataset.fromDataFrame(spark, df, sketchCols = Seq("later"))
  }

  test("untracked columns and unknown columns fail open") {
    val ds = freshLake()
    assert(ds.metaApproxDistinct(Seq("o_orderkey")).isEmpty) // not tracked
    assert(ds.metaApproxDistinct(Seq("nope")).isEmpty)
  }

  test("upsert invalidates; materialize / ANALYZE recompute tight") {
    val ds = freshLake()
    val minKey = orders.agg(min(col("o_orderkey"))).head().getLong(0)
    ds.upsert(orders.filter(col("o_orderkey") === minKey)
      .withColumn("o_custkey", lit(424242L))
      .withColumn("o_batch", (col("o_orderkey") / 500).cast("int")),
      keys = Seq("o_orderkey"))
    assert(ds.metaApproxDistinct(Seq("o_custkey")).isEmpty,
      "a merged cell's registers cannot be subtracted — must fail open")
    ds.compact() // rebuild recomputes every cell's stats tight
    val meta = ds.metaApproxDistinct(Seq("o_custkey"))
    assert(meta.isDefined)
    assert(meta.get("o_custkey") == scanEstimate(ds.toDF, "o_custkey"))
  }

  test("manifest round-trips sketches under the tightness vouch") {
    val root = java.nio.file.Files.createTempDirectory("graft_hll").toString
    val ds = freshLake()
    ds.storage = Some(graft.model.StorageSpec(root))
    val expected = ds.metaApproxDistinct(Seq("o_custkey")).get("o_custkey")
    ds.toStorage()
    val loaded = LakeDataset.fromStorage(spark, root)
    assert(loaded.sketchCols == List("o_custkey"))
    val meta = loaded.metaApproxDistinct(Seq("o_custkey"))
    assert(meta.isDefined, "vouched sketches must restore on load")
    assert(meta.get("o_custkey") == expected)
    LakeDataset.deleteRecursively(java.nio.file.Paths.get(root))
  }

  test("SQL hll_sketch_estimate(hll_sketch_agg(c)) collapses to a LocalRelation") {
    val ds = freshLake()
    val db = new Database(spark)
    db.register("hll_sql_t", ds)
    val df = db.executeSql(
      "SELECT hll_sketch_estimate(hll_sketch_agg(o_custkey)) AS approx_cust " +
        "FROM hll_sql_t")
    assert(df.queryExecution.optimizedPlan.isInstanceOf[LocalRelation],
      s"expected full collapse, got:\n${df.queryExecution.optimizedPlan}")
    assert(df.head().getLong(0) == scanEstimate(ds.toDF, "o_custkey"))
    // Mixed with exact metadata aggregates: still one LocalRelation.
    val mixed = db.executeSql(
      """SELECT COUNT(*) AS cnt,
        |       hll_sketch_estimate(hll_sketch_agg(o_custkey)) AS approx_cust
        |FROM hll_sql_t""".stripMargin)
    assert(mixed.queryExecution.optimizedPlan.isInstanceOf[LocalRelation])
    assert(mixed.head().getLong(0) == ds.toDF.count())
    // Partition-value filter selects whole cells: still collapses, and the
    // folded union covers exactly the filtered cells.
    val filtered = db.executeSql(
      """SELECT hll_sketch_estimate(hll_sketch_agg(o_custkey)) AS approx_cust
        |FROM hll_sql_t WHERE o_batch = 1""".stripMargin)
    assert(filtered.queryExecution.optimizedPlan.isInstanceOf[LocalRelation])
    assert(filtered.head().getLong(0) ==
      scanEstimate(ds.toDF.filter(col("o_batch") === 1), "o_custkey"))
  }

  test("non-default lgK, untracked column, and plain approx_count_distinct never collapse") {
    val ds = freshLake()
    val db = new Database(spark)
    db.register("hll_sql_open_t", ds)
    def opensToScan(sql: String): Unit = {
      val df = db.executeSql(sql)
      assert(!df.queryExecution.optimizedPlan.isInstanceOf[LocalRelation], sql)
    }
    // Different precision than the catalog maintains: the scan's answer wins.
    opensToScan("SELECT hll_sketch_estimate(hll_sketch_agg(o_custkey, 14)) " +
      "AS a FROM hll_sql_open_t")
    // Untracked column: no sketches to fold.
    opensToScan("SELECT hll_sketch_estimate(hll_sketch_agg(o_orderkey)) " +
      "AS a FROM hll_sql_open_t")
    // HLL++ is a DIFFERENT sketch — its estimate may differ from ours, so
    // collapsing it would change a query's answer. Always the scan.
    opensToScan("SELECT approx_count_distinct(o_custkey) AS a FROM hll_sql_open_t")
  }

  test("zero-scan partition overlap: exact in the sparse regime, all pairs present") {
    import spark.implicits._
    // Partition A holds users 0..49, B holds 25..74 (25 shared), C holds
    // 1000..1019 (disjoint). Well under 2^LgK -> sketches exact.
    val rows = ((0L until 50L).map(("a", _)) ++
      (25L until 75L).map(("b", _)) ++
      (1000L until 1020L).map(("c", _))).toDF("seg", "uid")
    val ds = LakeDataset.fromDataFrame(spark, rows,
      partitionCols = Seq("seg"), sketchCols = Seq("uid"))
    val m = ds.metaPartitionOverlap("uid", "seg")
    assert(m.isDefined)
    val byPair = m.get.map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(byPair(("a", "b")) == ((50L, 50L, 25L)))
    assert(byPair(("a", "c")) == ((50L, 20L, 0L)))  // zero-overlap pair present
    assert(byPair(("b", "c")) == ((50L, 20L, 0L)))
    assert(byPair.size == 3)
  }

  test("SHOW OVERLAP verb: zero-scan matrix as SQL; refuses untracked loudly") {
    import spark.implicits._
    val rows = ((0L until 50L).map(("a", _)) ++
      (25L until 75L).map(("b", _))).toDF("seg", "uid")
    val db = new Database(spark)
    db.register("ov_t", LakeDataset.fromDataFrame(spark, rows,
      partitionCols = Seq("seg"), sketchCols = Seq("uid")))
    val m = db.executeSql("SHOW OVERLAP ov_t.uid BY seg")
      .as[(String, String, Long, Long, Long)].collect()
    assert(m.toSeq == Seq(("a", "b", 50L, 50L, 25L)))
    intercept[IllegalArgumentException] {
      db.executeSql("SHOW OVERLAP ov_t.seg BY seg")
    }
  }

  test("partition overlap fails open on untight stats and untracked columns") {
    import spark.implicits._
    val rows = (0L until 50L).map(i => (s"s${i % 2}", i)).toDF("seg", "uid")
    val ds = LakeDataset.fromDataFrame(spark, rows,
      partitionCols = Seq("seg"), sketchCols = Seq("uid"))
    assert(ds.metaPartitionOverlap("uid", "seg").isDefined)
    // Untracked column / non-partition column: None, never a wrong answer.
    assert(ds.metaPartitionOverlap("seg", "seg").isEmpty)
    assert(ds.metaPartitionOverlap("uid", "uid").isEmpty)
    // An upsert makes the touched cells untight -> the whole matrix fails
    // open (a half-fresh overlap would silently undercount).
    ds.upsert(Seq(("s0", 999L)).toDF("seg", "uid"), Seq("uid"))
    assert(ds.metaPartitionOverlap("uid", "seg").isEmpty)
    // ANALYZE re-tightens; the new user is visible in the re-fold.
    ds.analyze()
    val m = ds.metaPartitionOverlap("uid", "seg")
    assert(m.isDefined)
    assert(m.get.head._3 == 26L || m.get.head._4 == 26L) // s0 gained uid 999
  }
}
