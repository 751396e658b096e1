package org.apache.spark.sql.graftbridge

import java.io.ByteArrayOutputStream

import org.apache.spark.TaskContext
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.arrow.{ArrowBatchStreamWriter, ArrowConverters}

/** Executor-parallel Arrow IPC encode for the wire path.
  *
  * The driver-side encoder (`graft.sources.ArrowInterchange`) streams rows
  * through `toLocalIterator` and builds every vector on ONE thread — bounded
  * memory, but a 100×-scale SELECT funnels all conversion work through the
  * driver. Here each PARTITION serializes its own record batches with
  * Spark's InternalRow→Arrow converter (the machinery behind `toPandas`),
  * and the driver only concatenates the already-framed batch messages
  * behind one schema header. Conversion cost is distributed across the
  * cluster; driver work drops to a byte copy per batch.
  *
  * Batches are uncompressed (Spark's converter has no batch-level codec) —
  * the trade documented on `LakeServer.selectIpc`, which keeps the
  * zstd driver path for small results.
  */
object ArrowParallel {

  /** Serialize `df` to one Arrow IPC stream, encoding on the executors.
    * Returns (stream bytes, row count) — the count rides the same job.
    */
  def toIpcBytesDistributed(
      df: DataFrame, batchRows: Int = 16384): (Array[Byte], Long) = {
    val spark = df.sparkSession
    val schema = df.schema
    val tz = spark.sessionState.conf.sessionLocalTimeZone
    val perPartition: Array[(Array[Array[Byte]], Long)] =
      df.queryExecution.toRdd.mapPartitions { rows =>
        var n = 0L
        val counting = rows.map { r: InternalRow => n += 1; r }
        val batches = ArrowConverters.toBatchIterator(
          counting, schema, batchRows.toLong, tz,
          true, false, TaskContext.get()).toArray
        Iterator.single((batches, n))
      }.collect()
    val out = new ByteArrayOutputStream()
    val writer = new ArrowBatchStreamWriter(schema, out, tz, true, false)
    writer.writeBatches(perPartition.iterator.flatMap(_._1))
    writer.end()
    (out.toByteArray, perPartition.map(_._2).sum)
  }
}
