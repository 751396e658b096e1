package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

import graft.lake.LakeDataset
import graft.model.StorageSpec
import graft.operators.Joins

/** Catalog-driven DPP join (Joins.dppJoin): cell pruning from the
  * dimension's key set, equality with the plain join, fail-open paths.
  */
class DppJoinSpec extends SparkSpec {

  private def lineitem: DataFrame = Fixtures.table(spark, sf(), "lineitem")
  private def orders: DataFrame = Fixtures.table(spark, sf(), "orders")

  /** Disk-backed range-celled lineitem lake: pruned reads plan only the
    * kept cells' directories, so the prune is visible in scanRootPaths.
    */
  private lazy val diskFact: LakeDataset = {
    val root = java.nio.file.Files.createTempDirectory("graft_dpp").toString
    val ds = LakeDataset.fromDataFrame(spark,
      lineitem.withColumn("l_batch", (col("l_orderkey") / 200).cast("int")),
      partitionCols = Seq("l_batch"), storage = Some(StorageSpec(root)))
    ds.toStorage()
    LakeDataset.fromStorage(spark, root)
  }

  private def dim: DataFrame =
    orders.filter(col("o_orderkey").between(300L, 500L))

  private def truth: Seq[org.apache.spark.sql.Row] = {
    val l = lineitem
    val d = dim
    l.join(d, l("l_orderkey") === d("o_orderkey"))
      .groupBy(l("l_orderkey")).agg(count(lit(1)).as("n"))
      .orderBy("l_orderkey").collect().toSeq
  }

  test("prunes to the cells the dimension keys can touch; result exact") {
    val joined = Joins.dppJoin(diskFact, "l_orderkey", dim, "o_orderkey")
    val total = diskFact.numParts
    val opened = Bridge.scanRootPaths(joined).count(_.contains("l_batch="))
    assert(opened > 0 && opened < total / 2,
      s"expected a visible prune: opened $opened of $total cells")
    // The proven-small dimension must BROADCAST (never shuffle the fact).
    val phys = joined.queryExecution.executedPlan.toString
    assert(phys.contains("BroadcastHashJoin"), s"expected broadcast join:\n$phys")
    val got = joined.groupBy(col("l_orderkey")).agg(count(lit(1)).as("n"))
      .orderBy("l_orderkey").collect().toSeq
    assert(got == truth)
  }

  test("over-cap dimension fails open to the plain join, same rows") {
    val joined = Joins.dppJoin(diskFact, "l_orderkey", dim, "o_orderkey",
      maxDriverKeys = 3)
    val got = joined.groupBy(col("l_orderkey")).agg(count(lit(1)).as("n"))
      .orderBy("l_orderkey").collect().toSeq
    assert(got == truth)
  }

  test("IntegerType dimension key still prunes; non-integral fails open") {
    // An int dim key must not ClassCastException — it casts to long for the
    // catalog probe and prunes identically.
    val intDim = dim.withColumn("o_orderkey", col("o_orderkey").cast("int"))
    val joined = Joins.dppJoin(diskFact, "l_orderkey", intDim, "o_orderkey")
    val opened = Bridge.scanRootPaths(joined).count(_.contains("l_batch="))
    assert(opened > 0 && opened < diskFact.numParts / 2,
      s"int-keyed prune missing: opened $opened of ${diskFact.numParts}")
    val got = joined.groupBy(col("l_orderkey")).agg(count(lit(1)).as("n"))
      .orderBy("l_orderkey").collect().toSeq
    assert(got == truth)
    // A string key cannot route through the long-keyed catalog probe —
    // fall open to the plain join (same rows), never a runtime cast error.
    val strDim = dim.withColumn("o_orderkey", col("o_orderkey").cast("string"))
    val open = Joins.dppJoin(diskFact, "l_orderkey", strDim, "o_orderkey")
    val gotOpen = open.groupBy(col("l_orderkey")).agg(count(lit(1)).as("n"))
      .orderBy("l_orderkey").collect().toSeq
    assert(gotOpen == truth)
  }

  test("empty dimension joins to an empty result without scanning cells") {
    val joined = Joins.dppJoin(diskFact, "l_orderkey",
      dim.filter(lit(false)), "o_orderkey")
    assert(Bridge.scanRootPaths(joined).count(_.contains("l_batch=")) == 0)
    assert(joined.count() == 0L)
  }
}
