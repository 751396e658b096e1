package org.apache.spark.sql.graftbridge

import java.io.ByteArrayOutputStream
import java.nio.channels.Channels

import org.apache.arrow.compression.CommonsCompressionFactory
import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector.{VectorSchemaRoot, VectorUnloader}
import org.apache.arrow.vector.compression.CompressionUtil
import org.apache.arrow.vector.ipc.{ArrowStreamWriter, WriteChannel}
import org.apache.arrow.vector.ipc.message.{IpcOption, MessageSerializer}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.arrow.ArrowWriter
import org.apache.spark.sql.util.ArrowUtils

/** Executor-parallel Arrow IPC encode for the wire path.
  *
  * The driver-side encoder (`graft.sources.ArrowInterchange`) streams rows
  * through `toLocalIterator` and builds every vector on ONE thread — bounded
  * memory, but a 100×-scale SELECT funnels all conversion work through the
  * driver. Here each PARTITION converts its own rows (Spark's
  * InternalRow→Arrow writer) and serializes FRAMED record-batch messages —
  * zstd/lz4-compressed at the batch level, exactly like the single-stream
  * encoder, since the codec rides in each batch's own metadata. The driver
  * only concatenates: one schema header, every partition's framed messages
  * in partition order, one end-of-stream marker. Conversion AND compression
  * cost distribute across the cluster; driver work drops to a byte copy per
  * batch.
  */
object ArrowParallel {

  /** Serialize `df` to one Arrow IPC stream, encoding (and compressing) on
    * the executors. Returns (stream bytes, row count) — the count rides the
    * same job.
    */
  def toIpcBytesDistributed(
      df: DataFrame, batchRows: Int = 16384,
      codec: Option[String] = Some("zstd")): (Array[Byte], Long) = {
    val perPartition: Array[(Array[(Array[Byte], Long)], Long)] =
      encodedRdd(df, batchRows, codec).collect()
    val out = new ByteArrayOutputStream()
    val ch = new WriteChannel(Channels.newChannel(out))
    ch.write(schemaMessage(df))
    perPartition.iterator.flatMap(_._1).foreach(b => ch.write(b._1))
    ArrowStreamWriter.writeEndOfStream(ch, IpcOption.DEFAULT)
    (out.toByteArray, perPartition.map(_._2).sum)
  }

  /** The chunked wire path: executor-encoded framed batches surfaced as a
    * LOCAL iterator of ((framed message, its row count)*, partition row
    * count) per partition — the driver holds ONE partition's frames at a
    * time and wraps bounded groups into standalone IPC streams with
    * [[schemaMessage]] + [[eosMessage]]. Per-FRAME counts let the consumer
    * cut chunks at record-batch granularity: a result AQE coalesced into
    * one big partition must still honor a rows-per-chunk contract.
    */
  def framedPartitions(
      df: DataFrame, batchRows: Int = 16384,
      codec: Option[String] = Some("zstd")): Iterator[(Array[(Array[Byte], Long)], Long)] =
    encodedRdd(df, batchRows, codec).toLocalIterator

  /** The serialized Arrow schema message that opens every stream of `df`. */
  def schemaMessage(df: DataFrame): Array[Byte] = {
    val tz = df.sparkSession.sessionState.conf.sessionLocalTimeZone
    val out = new ByteArrayOutputStream()
    MessageSerializer.serialize(new WriteChannel(Channels.newChannel(out)),
      ArrowUtils.toArrowSchema(df.schema, tz, true, false))
    out.toByteArray
  }

  /** The end-of-stream marker that closes every IPC stream. */
  def eosMessage(): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    ArrowStreamWriter.writeEndOfStream(
      new WriteChannel(Channels.newChannel(out)), IpcOption.DEFAULT)
    out.toByteArray
  }

  /** Per-partition framed, (optionally) compressed record-batch messages +
    * row counts — the executor-side encoder shared by the one-shot and
    * chunked paths.
    */
  private def encodedRdd(
      df: DataFrame, batchRows: Int,
      codec: Option[String]): org.apache.spark.rdd.RDD[(Array[(Array[Byte], Long)], Long)] = {
    val spark = df.sparkSession
    val schema = df.schema
    val tz = spark.sessionState.conf.sessionLocalTimeZone
    val codecName = codec.map(_.toLowerCase)

    df.queryExecution.toRdd.mapPartitions { rows =>
        val allocator = new RootAllocator()
        val arrowSchema = ArrowUtils.toArrowSchema(schema, tz, true, false)
        val root = VectorSchemaRoot.create(arrowSchema, allocator)
        try {
          val writer = ArrowWriter.create(root)
          val unloader = codecName match {
            case None => new VectorUnloader(root)
            case Some(c) =>
              val codecType = c match {
                case "zstd" => CompressionUtil.CodecType.ZSTD
                case "lz4" => CompressionUtil.CodecType.LZ4_FRAME
                case other => throw new IllegalArgumentException(
                  s"unsupported IPC codec: $other (zstd, lz4)")
              }
              new VectorUnloader(root, true,
                CommonsCompressionFactory.INSTANCE.createCodec(codecType), true)
          }
          val out = scala.collection.mutable.ArrayBuffer[(Array[Byte], Long)]()
          var n = 0L
          var inBatch = 0
          def flush(): Unit = if (inBatch > 0) {
            writer.finish()
            val rb = unloader.getRecordBatch
            try {
              val buf = new ByteArrayOutputStream()
              MessageSerializer.serialize(
                new WriteChannel(Channels.newChannel(buf)), rb)
              out += ((buf.toByteArray, inBatch.toLong))
            } finally rb.close()
            writer.reset()
            inBatch = 0
          }
          rows.foreach { r =>
            writer.write(r)
            n += 1
            inBatch += 1
            if (inBatch >= batchRows) flush()
          }
          flush()
          Iterator.single((out.toArray, n))
        } finally { root.close(); allocator.close() }
      }
  }
}
