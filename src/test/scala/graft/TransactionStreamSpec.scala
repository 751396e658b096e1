package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.lake.{Database, LakeDataset}

/** Pins the transaction × active-streaming-sink interaction: a streaming
  * query whose foreachBatch writes a transacted table SERIALIZES behind
  * the transaction — its micro-batch blocks at the dataset monitor the
  * transaction holds and lands AFTER commit or rollback, and is never
  * unwound by the rollback (only the body's own mutations are). The
  * documented anti-pattern — awaiting stream progress INSIDE the body —
  * would deadlock, because the micro-batch cannot acquire the monitor the
  * body holds; these tests never await inside the body.
  */
class TransactionStreamSpec extends SparkSpec {
  import spark.implicits._

  private def fixture(): (Database, LakeDataset) = {
    val db = new Database(spark)
    val ds = LakeDataset.fromDataFrame(spark,
      Seq((1L, "seed")).toDF("id", "src"))
    db.register("txs_t", ds)
    (db, ds)
  }

  private def ids(ds: LakeDataset, src: String): Set[Long] =
    ds.toDF.filter(col("src") === src).select("id")
      .collect().map(_.getLong(0)).toSet

  test("micro-batch during a COMMITTED transaction lands after it, intact") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val (db, ds) = fixture()
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long]
    val q = mem.toDF().toDF("id")
      .writeStream.foreachBatch((b: DataFrame, _: Long) =>
        ds.insert(b.withColumn("src", lit("stream")))).start()
    try {
      db.transaction(Seq("txs_t")) {
        ds.insert(Seq((10L, "tx")).toDF("id", "src"))
        mem.addData(100L, 101L)
        // Give the stream thread time to reach ds.insert and block on the
        // monitor this body holds. Reading HERE is safe (reentrant lock):
        // the streamed rows must NOT be visible inside the body — the
        // micro-batch is serialized behind the transaction, not woven in.
        Thread.sleep(500)
        assert(ids(ds, "stream").isEmpty,
          "a micro-batch interleaved with an open transaction body")
      }
      q.processAllAvailable()
      assert(ids(ds, "tx") == Set(10L))
      assert(ids(ds, "stream") == Set(100L, 101L))
    } finally q.stop()
  }

  test("rollback unwinds the body's mutations but never the micro-batch") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val (db, ds) = fixture()
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long]
    val q = mem.toDF().toDF("id")
      .writeStream.foreachBatch((b: DataFrame, _: Long) =>
        ds.insert(b.withColumn("src", lit("stream")))).start()
    try {
      intercept[RuntimeException] {
        db.transaction(Seq("txs_t")) {
          ds.insert(Seq((20L, "tx")).toDF("id", "src"))
          mem.addData(200L)
          Thread.sleep(500)
          throw new RuntimeException("abort")
        }
      }
      q.processAllAvailable()
      assert(ids(ds, "tx").isEmpty, "rolled-back body mutation leaked")
      assert(ids(ds, "stream") == Set(200L),
        "the rollback must not swallow a concurrent micro-batch")
      assert(ids(ds, "seed") == Set(1L))
    } finally q.stop()
  }
}
