package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.lake.LakeDataset
import graft.operators.{DataQuality, Diff}

/** Keyed snapshot diff and validated ingest: classification semantics
  * (incl. null-safe compares), accept/quarantine partition, loudness.
  */
class DiffSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("v", DoubleType),
    StructField("s", StringType)))

  private def df(rows: (Long, java.lang.Double, String)*) =
    spark.createDataFrame(
      java.util.Arrays.asList(rows.map(r => Row(r._1, r._2, r._3)): _*), schema)

  test("diff classifies added/removed/changed/unchanged with null-safe compare") {
    val left = df((1L, 1.0, "a"), (2L, null, "b"), (3L, 3.0, null), (4L, 4.0, "d"))
    val right = df((1L, 1.0, "a"), (2L, null, "b"), (3L, 9.0, null), (5L, 5.0, "e"))
    val got = Diff.diffTables(left, right, Seq("k"))
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), if (r.isNullAt(2)) -1 else r.getInt(2))).toMap
    assert(got(1L) == ("unchanged", 0))
    assert(got(2L) == ("unchanged", 0)) // null == null under <=>
    assert(got(3L) == ("changed", 1))   // v differs, null s matches
    assert(got(4L) == ("removed", -1))
    assert(got(5L) == ("added", -1))
    val summary = Diff.diffSummary(left, right, Seq("k"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(summary == Map("unchanged" -> 2L, "changed" -> 1L,
      "removed" -> 1L, "added" -> 1L))
  }

  test("validated ingest partitions rows exactly; nothing lost, nothing dirty") {
    val o = Fixtures.table(spark, sf(), "orders")
    val ds = LakeDataset.fromDataFrame(spark, o.limit(0))
    val quarantined = DataQuality.insertValidated(ds, o, Seq(
      DataQuality.InRange("o_totalprice", 0.0, 100000.0),
      DataQuality.MatchesRegex("o_orderpriority", "^[1-3]-.*$")))
    val bad = o.filter(!col("o_totalprice").between(0.0, 100000.0) ||
      !col("o_orderpriority").rlike("^[1-3]-.*$"))
    // Quarantine is exactly the violating set; the table holds the rest.
    assert(quarantined.count() == bad.count())
    assert(ds.toDF.count() == o.count() - bad.count())
    assert(ds.toDF.filter(!col("o_totalprice").between(0.0, 100000.0)).count() == 0L)
    // Every quarantined row carries at least one named violation.
    assert(quarantined.filter(size(col("__violations")) === 0).count() == 0L)
    // Accepted + quarantined reconstruct the input.
    assert(ds.toDF.unionByName(quarantined.drop("__violations"))
      .exceptAll(o).count() == 0L)
    // Set-level Unique is rejected loudly.
    val e = intercept[IllegalArgumentException] {
      DataQuality.validate(o, Seq(DataQuality.Unique(Seq("o_orderkey"))))
    }
    assert(e.getMessage.contains("set-level"))
    // RefIntegrity tags rows whose FK misses.
    val ref = Fixtures.table(spark, sf(), "customer")
    val tagged = DataQuality.validate(
      o.withColumn("o_custkey",
        when(col("o_orderkey") % 10 === 0, col("o_custkey") + 1000000)
          .otherwise(col("o_custkey"))),
      Seq(DataQuality.RefIntegrity("o_custkey", ref, "c_custkey")))
    assert(tagged.filter(size(col("__violations")) > 0).count() ==
      o.filter(col("o_orderkey") % 10 === 0).count())
  }

  test("streaming validated ingest: contract holds per micro-batch") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ds = LakeDataset.fromDataFrame(spark,
      Seq((0L, 10.0)).toDF("k", "v").limit(0))
    val quarantine = LakeDataset.fromDataFrame(spark,
      Seq((0L, 10.0, "x")).toDF("k", "v", "violations").limit(0))
    val sink = graft.streaming.StreamingIngest.validatedBatches(ds, quarantine,
      Seq(DataQuality.InRange("v", 0.0, 100.0), DataQuality.NotNull("v")))
    val mem = MemoryStream[(Long, Double)]
    val q = mem.toDF().toDF("k", "v").writeStream.foreachBatch(sink).start()
    try {
      mem.addData((1L, 5.0), (2L, 500.0), (3L, 50.0))
      q.processAllAvailable()
      mem.addData((4L, -1.0), (5L, 99.0))
      q.processAllAvailable()
    } finally q.stop()
    // Clean rows (1,3,5) in the table; violators (2,4) tagged in quarantine.
    assert(ds.toDF.select("k").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 3L, 5L))
    val quar = quarantine.toDF.orderBy("k").collect()
    assert(quar.map(_.getLong(0)).toSeq == Seq(2L, 4L))
    assert(quar.forall(_.getString(2) == "in_range(v)"))
  }
}
