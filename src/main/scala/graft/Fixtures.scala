package graft

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

import graft.lake.LakeDataset

/** Shared per-(sfDir) lake fixtures so Verify/Bench don't rebuild the same
  * partitioned dataset for every query that exercises it.
  */
object Fixtures {

  private val cache = TrieMap[String, LakeDataset]()

  def table(s: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(s, dir)
    else s.read.parquet(s"$dir/$name.parquet")

  /** The events table carries a TIMESTAMP(NANOS) parquet column, which Spark
    * refuses by default (PARQUET_TYPE_ILLEGAL). Read it as a long of nanos
    * (legacy conf) and convert to a microsecond timestamp with integer
    * division — a double division would lose precision above 2^53 ns.
    */
  private def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = s.read.parquet(s"$dir/events.parquet")
    raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }

  /** lineitem partitioned by l_returnflag, hash-bucketed by l_partkey into 5
    * buckets — the testdata stand-in for the reference's `stock_current`
    * layout (FIXTURES.md role mapping; reference src/dataset.rs:427-428).
    */
  def lineitemLake(s: SparkSession, dir: String): LakeDataset =
    cache.getOrElseUpdate(s"$dir#lineitem", LakeDataset.fromDataFrame(
      s, table(s, dir, "lineitem"),
      partitionCols = Seq("l_returnflag"),
      bucketCols = Seq("l_partkey"),
      nBuckets = 5))

  def clear(): Unit = cache.clear()
}
