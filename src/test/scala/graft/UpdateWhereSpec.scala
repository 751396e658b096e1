package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.lake.{Database, LakeDataset}
import graft.operators.Stats

/** Predicate update (LakeDataset.updateWhere + the SQL UPDATE route):
  * old-row assignment semantics, NULL-predicate rows untouched, cell
  * pruning, guarded layout columns, stats interplay.
  */
class UpdateWhereSpec extends SparkSpec {

  private def orders: DataFrame = Fixtures.table(spark, sf(), "orders")

  private def rangeLake(): LakeDataset =
    LakeDataset.fromDataFrame(spark,
      orders.withColumn("o_batch", (col("o_orderkey") / 200).cast("int")),
      partitionCols = Seq("o_batch"))

  test("assignment RHS sees the OLD row: a swap swaps") {
    val df = spark.range(1, 4).toDF("k")
      .withColumn("a", col("k") * 10).withColumn("b", col("k") * 100)
    val ds = LakeDataset.fromDataFrame(spark, df)
    ds.updateWhere(col("k") <= 2, Seq("a" -> col("b"), "b" -> col("a")))
    val rows = ds.toDF.orderBy("k").collect()
    assert(rows.map(r => (r.getLong(1), r.getLong(2))).toSeq ==
      Seq((100L, 10L), (200L, 20L), (30L, 300L)))
  }

  test("prunes to touched cells; count metadata stays exact; assigned column's does not") {
    val ds = rangeLake()
    val total = ds.numParts
    val touched = ds.updateWhere(col("o_orderkey").between(300L, 500L),
      Seq("o_totalprice" -> (col("o_totalprice") + 1000000)))
    assert(touched > 0 && touched < total / 2,
      s"expected a visible prune: touched $touched of $total cells")
    // Count unchanged and still metadata-answerable; the key column's
    // bounds too (unassigned). The PRICE column's stats went unknown —
    // its new values escaped the old zone, so the old bound would be WRONG.
    assert(Stats.metaAnswerable(ds, Seq("o_orderkey")))
    assert(Stats.tableStats(spark, ds, Nil).head().getLong(0) == orders.count())
    assert(!Stats.metaAnswerable(ds, Seq("o_totalprice")))
    val truth = orders.agg(
      dsumD(when(col("o_orderkey").between(300L, 500L),
        col("o_totalprice") + 1000000).otherwise(col("o_totalprice")))).head().getDouble(0)
    val got = ds.toDF.agg(dsumD(col("o_totalprice"))).head().getDouble(0)
    assert(got == truth)
    // materialize restores the assigned column's stats, now tight.
    ds.materialize()
    assert(Stats.metaAnswerable(ds, Seq("o_totalprice")))
    assert(Stats.tableStats(spark, ds, Seq("o_totalprice")).head().getDouble(2)
      >= 1000000.0)
  }

  test("NULL-predicate rows are untouched") {
    val df = spark.createDataFrame(java.util.Arrays.asList(
      org.apache.spark.sql.Row(1L, java.lang.Double.valueOf(5.0)),
      org.apache.spark.sql.Row(2L, null)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.DoubleType))))
    val ds = LakeDataset.fromDataFrame(spark, df)
    ds.updateWhere(col("v") > 1.0, Seq("k" -> (col("k") + 100)))
    assert(ds.toDF.select("k").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(2L, 101L))
  }

  test("partition/bucket and unknown columns are rejected") {
    val ds = rangeLake()
    val e1 = intercept[IllegalArgumentException] {
      ds.updateWhere(lit(true), Seq("o_batch" -> lit(99)))
    }
    assert(e1.getMessage.contains("partition/bucket"))
    val e2 = intercept[IllegalArgumentException] {
      ds.updateWhere(lit(true), Seq("nope" -> lit(1)))
    }
    assert(e2.getMessage.contains("unknown column"))
  }

  test("SQL UPDATE routes through the same machinery") {
    val o = orders.withColumn("o_batch", (col("o_orderkey") / 200).cast("int"))
    val db = new Database(spark)
    db.register("upd_t", LakeDataset.fromDataFrame(spark, o,
      partitionCols = Seq("o_batch")))
    val touched = db.executeDml(
      "UPDATE upd_t SET o_totalprice = o_totalprice + 7 WHERE o_orderkey BETWEEN 300 AND 400")
    assert(touched > 0)
    val got = db.executeSql(
      """SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(38,2))) AS DOUBLE) AS t
        |FROM upd_t""".stripMargin).head().getDouble(0)
    val truth = orders.agg(
      dsumD(when(col("o_orderkey").between(300L, 400L), col("o_totalprice") + 7)
        .otherwise(col("o_totalprice")))).head().getDouble(0)
    assert(got == truth)
  }

  /** Exact decimal-accumulated sum of a 2-decimal double expression. */
  private def dsumD(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    sum(c.cast(org.apache.spark.sql.types.DecimalType(38, 2)))
      .cast(org.apache.spark.sql.types.DoubleType)
}
