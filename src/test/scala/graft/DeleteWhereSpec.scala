package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.lake.LakeDataset
import graft.operators.Stats

/** Predicate delete (LakeDataset.deleteWhere): SQL NULL semantics, cell
  * pruning, interplay with tight statistics, manifest round trip.
  */
class DeleteWhereSpec extends SparkSpec {

  private def orders: DataFrame = Fixtures.table(spark, sf(), "orders")

  private def rangeLake(): LakeDataset =
    LakeDataset.fromDataFrame(spark,
      orders.withColumn("o_batch", (col("o_orderkey") / 200).cast("int")),
      partitionCols = Seq("o_batch"))

  test("deletes exactly the predicate's TRUE rows, pruned to touched cells") {
    val ds = rangeLake()
    val total = ds.numParts
    val cond = col("o_orderkey").between(300L, 500L) && col("o_orderstatus") === "F"
    // Untouched cells must keep their very plan objects (not just content).
    val untouchedKey = ds.partKeys.find(_.partValues.exists(_._2 == "0")).get
    val planBefore = ds.part(untouchedKey).get.df
    val touched = ds.deleteWhere(cond)
    assert(touched > 0 && touched < total / 2,
      s"expected a visible prune: touched $touched of $total cells")
    assert(ds.part(untouchedKey).get.df eq planBefore)
    assert(ds.part(untouchedKey).get.statsTight.get)
    val expected = orders.filter(!coalesce(cond, lit(false))).count()
    assert(ds.toDF.count() == expected)
    assert(ds.toDF.filter(cond).count() == 0L)
  }

  test("rows with a NULL predicate survive (SQL DELETE semantics)") {
    val df = spark.createDataFrame(java.util.Arrays.asList(
      org.apache.spark.sql.Row(1L, java.lang.Double.valueOf(5.0)),
      org.apache.spark.sql.Row(2L, null),
      org.apache.spark.sql.Row(3L, java.lang.Double.valueOf(50.0))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.DoubleType))))
    val ds = LakeDataset.fromDataFrame(spark, df)
    ds.deleteWhere(col("v") > 10.0)
    // Row 3 goes (TRUE); rows 1 (FALSE) and 2 (NULL) stay.
    assert(ds.toDF.select("k").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
  }

  test("tight stats drop on touched cells only; materialize re-tightens") {
    val ds = rangeLake()
    val statCols = Seq("o_orderkey")
    assert(Stats.metaAnswerable(ds, statCols))
    val minKey = orders.agg(min(col("o_orderkey"))).head().getLong(0)
    ds.deleteWhere(col("o_orderkey") <= minKey + 10L)
    assert(!Stats.metaAnswerable(ds, statCols)) // a touched cell is untight
    ds.materialize()
    assert(Stats.metaAnswerable(ds, statCols))
    val metaMin = Stats.tableStats(spark, ds, statCols).head().getLong(1)
    assert(metaMin > minKey + 10L) // deletion visible in the tight bound
  }

  test("bucket-column equality prunes to one bucket's cells") {
    val ds = LakeDataset.fromDataFrame(spark, orders,
      bucketCols = Seq("o_orderkey"), nBuckets = 5)
    val total = ds.numParts
    // Equality on the bucket column routes through localBucketId: only the
    // one bucket cell (of 5) can hold key 42.
    val touched = ds.deleteWhere(col("o_orderkey") === 42L)
    assert(touched == 1, s"expected 1 bucket cell of $total, got $touched")
    assert(ds.toDF.filter(col("o_orderkey") === 42L).count() == 0L)
    assert(ds.toDF.count() == orders.count() - 1)
  }

  test("a provably disjoint predicate touches nothing") {
    val ds = rangeLake()
    assert(ds.deleteWhere(col("o_orderkey") > 100000000L) == 0)
    assert(ds.toDF.count() == orders.count())
    assert(Stats.metaAnswerable(ds, Seq("o_orderkey")))
  }

  test("deleteWhere survives a save/load round trip") {
    val root = java.nio.file.Files.createTempDirectory("graft_delw").toString
    val ds = LakeDataset.fromDataFrame(spark,
      orders.withColumn("o_batch", (col("o_orderkey") / 200).cast("int")),
      partitionCols = Seq("o_batch"),
      storage = Some(graft.model.StorageSpec(root)))
    ds.deleteWhere(col("o_orderstatus") === "O")
    ds.toStorage()
    val loaded = LakeDataset.fromStorage(spark, root)
    assert(loaded.toDF.count() ==
      orders.filter(col("o_orderstatus") =!= "O").count())
    assert(loaded.toDF.filter(col("o_orderstatus") === "O").count() == 0L)
  }
}
