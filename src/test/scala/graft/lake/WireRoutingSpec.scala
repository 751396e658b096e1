package graft.lake

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Pins [[LakeServer.estimateBig]]'s job-free routing — which wire encoder
  * runs — on its three stats sources: an optimizer row count, a size-only
  * estimate, and the fail-toward-big default for unknowable leaves. The
  * regression to guard against is the old probe (`limit(n+1).count()`),
  * which executed every expensive query twice before encoding it.
  */
class WireRoutingSpec extends graft.SparkSpec {

  private lazy val server = new LakeServer(spark)

  test("rowCount path: known row counts route on parallelEncodeRows") {
    // Range carries an exact row count in plan statistics — no job runs.
    assert(!server.estimateBig(spark.range(10).toDF()))
    assert(server.estimateBig(spark.range(1000000).toDF()))
    spark.conf.set("spark.graft.wire.parallelEncodeRows", "5")
    try assert(server.estimateBig(spark.range(10).toDF()))
    finally spark.conf.unset("spark.graft.wire.parallelEncodeRows")
  }

  test("sizeInBytes path: file-backed scans route on parallelEncodeBytes") {
    val docs = spark.read.parquet(s"${sf("sf0.001")}/documents.parquet")
    assert(docs.queryExecution.optimizedPlan.stats.rowCount.isEmpty,
      "precondition: parquet scan has no optimizer row count (else this " +
        "test exercises the wrong branch)")
    assert(!server.estimateBig(docs)) // small file, default 64 MB cap
    spark.conf.set("spark.graft.wire.parallelEncodeBytes", "1")
    try assert(server.estimateBig(docs))
    finally spark.conf.unset("spark.graft.wire.parallelEncodeBytes")
  }

  test("unknown stats fail toward BIG: an opaque RDD-backed plan routes distributed") {
    // LogicalRDD reports spark.sql.defaultSizeInBytes (Long.MaxValue-ish):
    // a 3-row DataFrame the optimizer cannot size must take the
    // distributed/chunked encoder — the cost of misrouting small-to-big is
    // one extra job; big-to-small is a driver OOM.
    val rdd = spark.sparkContext.parallelize(Seq(Row(1L), Row(2L), Row(3L)))
    val df = spark.createDataFrame(rdd, StructType(Seq(StructField("k", LongType))))
    assert(df.queryExecution.optimizedPlan.stats.rowCount.isEmpty)
    assert(server.estimateBig(df))
  }
}
