package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.{ArrowInterchange, ProtoCodec}
import graft.sources.ProtoCodec.PbSqlResults

/** Client-side helpers for the `db.Db` wire protocol.
  *
  * The server answers one `Sql` with one OR MORE `SqlResults` messages
  * (proto declares `stream SqlResults`; the reference only ever sends one —
  * src/server.rs:288-297 — but this engine chunks big results so driver and
  * client each hold O(chunk)). A client must therefore group responses by
  * qid and concatenate. This is that contract, written down as code a JVM
  * client can call directly and a non-JVM client can copy.
  */
object WireClient {

  /** Reassemble one query's chunked response: every chunk is a standalone
    * Arrow IPC stream carrying its own row count; the result is their
    * concatenation in arrival order. Single-message responses pass through
    * unchanged (`chunks.size == 1`). Throws on mixed qids — interleaved
    * responses must be grouped with [[groupByQid]] first.
    */
  def reassemble(spark: SparkSession, chunks: Seq[PbSqlResults]): (DataFrame, Long) = {
    require(chunks.nonEmpty, "no SqlResults messages to reassemble")
    require(chunks.map(_.qid).distinct.sizeIs == 1,
      s"mixed qids in one reassembly: ${chunks.map(_.qid).distinct}")
    val total = chunks.map(_.rows).sum
    val parts = chunks.map(c => ArrowInterchange.fromIpcBytes(spark, c.data))
    (parts.reduce(_ unionByName _), total)
  }

  /** Group an interleaved response stream by qid, arrival order preserved
    * within each query (the server emits one query's chunks contiguously,
    * but a defensive client should not rely on it).
    */
  def groupByQid(messages: Seq[PbSqlResults]): Map[Option[Int], Seq[PbSqlResults]] =
    messages.groupBy(_.qid)

  /** Decode raw wire bytes (a whole response stream) and reassemble every
    * query: the one-call client path from gRPC messages to DataFrames.
    */
  def decodeAll(spark: SparkSession, raw: Seq[Array[Byte]])
      : Map[Option[Int], (DataFrame, Long)] =
    groupByQid(raw.map(ProtoCodec.PbSqlResults.decode))
      .map { case (qid, chunks) => qid -> reassemble(spark, chunks) }
}
