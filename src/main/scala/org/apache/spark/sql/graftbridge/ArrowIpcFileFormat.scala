package org.apache.spark.sql.graftbridge

import java.nio.channels.Channels

import scala.jdk.CollectionConverters._

import org.apache.arrow.compression.CommonsCompressionFactory
import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector.compression.CompressionUtil
import org.apache.arrow.vector.ipc.{ArrowStreamReader, ArrowStreamWriter}
import org.apache.arrow.vector.ipc.message.IpcOption
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.hadoop.mapreduce.{Job, TaskAttemptContext}

import org.apache.spark.TaskContext
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.UnsafeProjection
import org.apache.spark.sql.execution.arrow.ArrowWriter
import org.apache.spark.sql.execution.datasources.{FileFormat, OutputWriter, OutputWriterFactory, PartitionedFile}
import org.apache.spark.sql.execution.vectorized.{ColumnVectorUtils, ConstantColumnVector}
import org.apache.spark.sql.sources.{DataSourceRegister, Filter}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.ArrowUtils
import org.apache.spark.sql.vectorized.{ArrowColumnVector, ColumnarBatch, ColumnVector}
import org.apache.spark.util.SerializableConfiguration

/** Arrow IPC *file* storage — the reference's `Format::Ipc` persistence
  * (reference: src/storage.rs:13-21) as a real Spark `FileFormat`, so it
  * plugs into the SAME distributed machinery parquet uses: executors write
  * one `.arrow` stream file per task through the committer, reads are one
  * task per file with Hive-style partition-directory recovery, and column
  * pruning selects only the requested vectors from each record batch.
  *
  * Registered as `arrowipc` (META-INF service), usable anywhere a format
  * string goes: `df.write.format("arrowipc")`, `StorageSpec(format =
  * "arrowipc")`. Schema comes from the IPC stream itself (self-describing)
  * or an explicit `.schema(...)`.
  *
  * Codec: `compression` option `zstd` (default; the reference compresses
  * its IPC payloads with zstd), `lz4`, or `none`. `snappy` — the lake's
  * parquet-oriented default codec name — maps to zstd: IPC has no snappy
  * codec and failing a save over a codec-name default would be hostile.
  *
  * Files are NOT split (an IPC stream has no block-level index); at scale
  * parallelism comes from many files per part, which is how the writer lays
  * them out anyway (one per task).
  */
final class ArrowIpcFileFormat extends FileFormat with DataSourceRegister with Serializable {

  override def shortName(): String = "arrowipc"
  override def toString: String = "ArrowIPC"

  override def isSplitable(
      sparkSession: SparkSession,
      options: Map[String, String],
      path: Path): Boolean = false

  /** Vectorized output: the data already IS columnar (Arrow vectors), so
    * batches flow to ColumnarToRow without the per-row copy of the fallback
    * path. Enabled for atomic and array-of-atomic schemas; anything deeper
    * falls back to the row reader.
    */
  override def supportBatch(sparkSession: SparkSession, schema: StructType): Boolean = {
    def atomic(dt: DataType): Boolean = dt match {
      case _: StructType | _: MapType | _: ArrayType => false
      case _ => true
    }
    schema.fields.forall(f => f.dataType match {
      case ArrayType(et, _) => atomic(et)
      case dt => atomic(dt)
    })
  }

  override def inferSchema(
      sparkSession: SparkSession,
      options: Map[String, String],
      files: Seq[FileStatus]): Option[StructType] =
    files.find(_.getLen > 0).map { f =>
      val conf = sparkSession.sessionState.newHadoopConf()
      val in = f.getPath.getFileSystem(conf).open(f.getPath)
      try {
        val allocator = new RootAllocator()
        val reader = new ArrowStreamReader(in, allocator, CommonsCompressionFactory.INSTANCE)
        try ArrowUtils.fromArrowSchema(reader.getVectorSchemaRoot.getSchema)
        finally { reader.close(); allocator.close() }
      } finally in.close()
    }

  override def prepareWrite(
      sparkSession: SparkSession,
      job: Job,
      options: Map[String, String],
      dataSchema: StructType): OutputWriterFactory = {
    val codec = options.getOrElse("compression", "zstd").toLowerCase match {
      case "snappy" => "zstd" // no snappy IPC codec; zstd is the IPC default
      case c => c
    }
    val timeZoneId = sparkSession.sessionState.conf.sessionLocalTimeZone
    new OutputWriterFactory {
      override def getFileExtension(context: TaskAttemptContext): String = ".arrow"
      override def newInstance(
          path: String, dataSchema: StructType,
          context: TaskAttemptContext): OutputWriter =
        new ArrowIpcOutputWriter(path, dataSchema, context, codec, timeZoneId)
    }
  }

  override def buildReaderWithPartitionValues(
      sparkSession: SparkSession,
      dataSchema: StructType,
      partitionSchema: StructType,
      requiredSchema: StructType,
      filters: Seq[Filter],
      options: Map[String, String],
      hadoopConf: Configuration): PartitionedFile => Iterator[InternalRow] = {
    // Must mirror FileSourceScanExec's decision exactly: it plans
    // ColumnarToRow iff supportBatch on (required ++ partition) — we emit
    // ColumnarBatch in that case and rows otherwise.
    val vectorized =
      supportBatch(sparkSession, StructType(requiredSchema.fields ++ partitionSchema.fields))
    if (!vectorized)
      super.buildReaderWithPartitionValues(sparkSession, dataSchema, partitionSchema,
        requiredSchema, filters, options, hadoopConf)
    else {
      val confBc: Broadcast[SerializableConfiguration] =
        sparkSession.sparkContext.broadcast(new SerializableConfiguration(hadoopConf))
      val required = requiredSchema
      val partSchema = partitionSchema
      (file: PartitionedFile) => {
        if (file.length == 0) Iterator.empty
        else batchIterator(file, confBc.value.value, required, partSchema)
          .asInstanceOf[Iterator[InternalRow]]
      }
    }
  }

  /** Batches straight off the IPC stream: required data columns as
    * [[ArrowColumnVector]]s (zero copy out of the stream's own vectors),
    * partition values and evolution-missing columns as constant vectors.
    * Vector memory is reused across `loadNextBatch`, matching the parquet
    * vectorized reader's contract with ColumnarToRow.
    */
  private def batchIterator(
      file: PartitionedFile, conf: Configuration,
      required: StructType, partSchema: StructType): Iterator[ColumnarBatch] = {
    val path = file.toPath
    val in = path.getFileSystem(conf).open(path)
    val allocator = new RootAllocator()
    val reader = new ArrowStreamReader(in, allocator, CommonsCompressionFactory.INSTANCE)
    val root = reader.getVectorSchemaRoot
    val fileSchema = ArrowUtils.fromArrowSchema(root.getSchema)
    val sources: Array[Either[Int, Int]] = required.fields.zipWithIndex.map {
      case (f, i) =>
        if (fileSchema.fieldNames.contains(f.name)) Left(fileSchema.fieldIndex(f.name))
        else Right(i)
    }
    def close(): Unit = { reader.close(); allocator.close() }
    Option(TaskContext.get()).foreach(_.addTaskCompletionListener[Unit](_ => close()))

    new Iterator[ColumnarBatch] {
      private var batch: ColumnarBatch = _
      private var exhausted = false
      private def advance(): Unit =
        while (batch == null && !exhausted) {
          if (reader.loadNextBatch()) {
            val n = root.getRowCount
            if (n > 0) {
              val dataCols: Array[ColumnVector] = sources.map {
                case Left(fi) => new ArrowColumnVector(root.getVector(fi))
                case Right(ri) =>
                  val c = new ConstantColumnVector(n, required.fields(ri).dataType)
                  c.setNull()
                  c
              }
              val partCols: Array[ColumnVector] =
                partSchema.fields.zipWithIndex.map { case (f, i) =>
                  val c = new ConstantColumnVector(n, f.dataType)
                  ColumnVectorUtils.populate(c, file.partitionValues, i)
                  c: ColumnVector
                }
              batch = new ColumnarBatch(dataCols ++ partCols, n)
            }
          } else { exhausted = true; close() }
        }
      override def hasNext: Boolean = { advance(); batch != null }
      override def next(): ColumnarBatch = { advance(); val b = batch; batch = null; b }
    }
  }

  override def buildReader(
      sparkSession: SparkSession,
      dataSchema: StructType,
      partitionSchema: StructType,
      requiredSchema: StructType,
      filters: Seq[Filter],
      options: Map[String, String],
      hadoopConf: Configuration): PartitionedFile => Iterator[InternalRow] = {
    val confBc: Broadcast[SerializableConfiguration] =
      sparkSession.sparkContext.broadcast(new SerializableConfiguration(hadoopConf))
    val required = requiredSchema // serialize the schema, not the session

    (file: PartitionedFile) => {
      if (file.length == 0) Iterator.empty
      else {
        val path = file.toPath
        val in = path.getFileSystem(confBc.value.value).open(path)
        val allocator = new RootAllocator()
        val reader = new ArrowStreamReader(in, allocator, CommonsCompressionFactory.INSTANCE)
        val root = reader.getVectorSchemaRoot
        val fileSchema = ArrowUtils.fromArrowSchema(root.getSchema)
        // Column pruning by NAME; a required column the file lacks (schema
        // evolution: parts saved before the column existed) reads as nulls,
        // matching parquet's missing-column semantics.
        val sources: Array[Either[Int, Int]] = required.fields.zipWithIndex.map {
          case (f, i) =>
            if (fileSchema.fieldNames.contains(f.name)) Left(fileSchema.fieldIndex(f.name))
            else Right(i)
        }
        val proj = UnsafeProjection.create(required)
        def close(): Unit = { reader.close(); allocator.close() }
        Option(TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ => close()))

        new Iterator[InternalRow] {
          private var rows: Iterator[InternalRow] = Iterator.empty
          private var exhausted = false
          private def advance(): Unit =
            while (!rows.hasNext && !exhausted) {
              if (reader.loadNextBatch()) {
                val n = root.getRowCount
                val cols: Array[ColumnVector] = sources.map {
                  case Left(fi) => new ArrowColumnVector(root.getVector(fi))
                  case Right(ri) =>
                    val c = new ConstantColumnVector(n, required.fields(ri).dataType)
                    c.setNull()
                    c
                }
                rows = new ColumnarBatch(cols, n).rowIterator().asScala
              } else { exhausted = true; close() }
            }
          override def hasNext: Boolean = { advance(); rows.hasNext }
          override def next(): InternalRow = proj(rows.next())
        }
      }
    }
  }
}

/** One IPC stream file per write task: rows buffer into Spark's own
  * InternalRow→Arrow writer and flush as record batches of [[ArrowIpcOutputWriter.BatchRows]],
  * so task memory is O(batch) regardless of part size.
  */
private final class ArrowIpcOutputWriter(
    val path: String,
    dataSchema: StructType,
    context: TaskAttemptContext,
    codec: String,
    timeZoneId: String) extends OutputWriter {

  private val out = {
    val p = new Path(path)
    p.getFileSystem(context.getConfiguration).create(p, false)
  }
  private val arrowWriter =
    ArrowWriter.create(dataSchema, timeZoneId, true, false)
  private val streamWriter = codec match {
    case "none" | "uncompressed" =>
      new ArrowStreamWriter(arrowWriter.root, null, Channels.newChannel(out))
    case c =>
      val codecType = c match {
        case "zstd" => CompressionUtil.CodecType.ZSTD
        case "lz4" => CompressionUtil.CodecType.LZ4_FRAME
        case other => throw new IllegalArgumentException(
          s"unsupported arrowipc codec: $other (zstd, lz4, none)")
      }
      new ArrowStreamWriter(arrowWriter.root, null, Channels.newChannel(out),
        IpcOption.DEFAULT, CommonsCompressionFactory.INSTANCE, codecType)
  }
  streamWriter.start()
  private var buffered = 0

  override def write(row: InternalRow): Unit = {
    arrowWriter.write(row)
    buffered += 1
    if (buffered >= ArrowIpcOutputWriter.BatchRows) flush()
  }

  private def flush(): Unit = if (buffered > 0) {
    arrowWriter.finish()
    streamWriter.writeBatch()
    arrowWriter.reset()
    buffered = 0
  }

  override def close(): Unit = {
    flush()
    streamWriter.end()
    streamWriter.close()
    out.close()
  }
}

private object ArrowIpcOutputWriter {
  /** Rows per record batch — bounds task memory during writes. */
  val BatchRows: Int = 16384
}
