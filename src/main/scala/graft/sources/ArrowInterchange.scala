package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.util.Collections

import scala.jdk.CollectionConverters._

import org.apache.arrow.compression.CommonsCompressionFactory
import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
import org.apache.arrow.vector.compression.CompressionUtil
import org.apache.arrow.vector.ipc.{ArrowStreamReader, ArrowStreamWriter}
import org.apache.arrow.vector.types.{FloatingPointPrecision, TimeUnit => ArrowTimeUnit}
import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema => ArrowSchema}
import org.apache.arrow.vector.util.Text

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Arrow IPC stream interchange — the reference's wire format (reference:
  * src/server.rs:36-46 decodes `SourceIpc.data` IPC bytes; src/server.rs:
  * 293-297 replies with IPC-serialized results). Spark's internal Arrow
  * converters are private API, so this speaks the PUBLIC Arrow Java API
  * (`arrow-vector` ships with Spark) for flat schemas: boolean, int/long,
  * float/double, string, binary, timestamp-µs, date.
  *
  * Driver-side by design: the reference serializes query RESULTS (already
  * collected) and decodes ingest CHUNKS (micro-batch sized) — both bounded;
  * bulk data movement stays on the parquet path.
  */
object ArrowInterchange {

  private def arrowField(f: StructField): Field = {
    val t: ArrowType = f.dataType match {
      case BooleanType => ArrowType.Bool.INSTANCE
      case IntegerType => new ArrowType.Int(32, true)
      case LongType => new ArrowType.Int(64, true)
      case FloatType => new ArrowType.FloatingPoint(FloatingPointPrecision.SINGLE)
      case DoubleType => new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE)
      case StringType => ArrowType.Utf8.INSTANCE
      case BinaryType => ArrowType.Binary.INSTANCE
      case TimestampType => new ArrowType.Timestamp(ArrowTimeUnit.MICROSECOND, "UTC")
      case TimestampNTZType => new ArrowType.Timestamp(ArrowTimeUnit.MICROSECOND, null)
      case DateType => new ArrowType.Date(org.apache.arrow.vector.types.DateUnit.DAY)
      case other => throw new IllegalArgumentException(s"unsupported IPC type: $other")
    }
    new Field(f.name, new FieldType(f.nullable, t, null), Collections.emptyList())
  }

  private def sparkField(f: Field): StructField = {
    val dt: DataType = f.getType match {
      case _: ArrowType.Bool => BooleanType
      case i: ArrowType.Int if i.getBitWidth == 32 => IntegerType
      case i: ArrowType.Int if i.getBitWidth == 64 => LongType
      case fp: ArrowType.FloatingPoint if fp.getPrecision == FloatingPointPrecision.SINGLE => FloatType
      case fp: ArrowType.FloatingPoint if fp.getPrecision == FloatingPointPrecision.DOUBLE => DoubleType
      case _: ArrowType.Utf8 => StringType
      case _: ArrowType.Binary => BinaryType
      case t: ArrowType.Timestamp if t.getTimezone == null => TimestampNTZType
      case _: ArrowType.Timestamp => TimestampType
      case _: ArrowType.Date => DateType
      case other => throw new IllegalArgumentException(s"unsupported IPC type: $other")
    }
    StructField(f.getName, dt, f.isNullable)
  }

  /** Rows per IPC record batch — bounds driver memory: the writer holds one
    * batch of vectors at a time, never the whole result.
    */
  val BatchRows: Int = 16384

  /** Serialize a DataFrame's rows to one Arrow IPC stream.
    *
    * `codec` compresses the record-batch buffers (reference: responses are
    * IPC + ZSTD, src/server.rs:293-297): "zstd" or "lz4"; None writes
    * uncompressed. [[fromIpcBytes]] auto-detects either form — the codec
    * travels in the IPC batch metadata.
    */
  def toIpcBytes(df: DataFrame, codec: Option[String] = None): Array[Byte] =
    toIpcBytesWithCount(df, codec)._1

  /** Streamed encode: rows arrive via `toLocalIterator` (one partition
    * resident at a time, not a whole-result `collect`) and leave as a
    * SEQUENCE of record batches of [[BatchRows]] each — a 100×-scale SELECT
    * through the wire keeps the driver at O(batch), and IPC readers (ours
    * and pyarrow) already consume multi-batch streams. Also returns the row
    * count (the wire's `SqlResults.rows`) without a second job.
    */
  def toIpcBytesWithCount(df: DataFrame, codec: Option[String] = None): (Array[Byte], Long) = {
    var result: (Array[Byte], Long) = (Array.emptyByteArray, 0L)
    toIpcChunked(df, codec, Long.MaxValue, Long.MaxValue) { (b, n) => result = (b, n) }
    result
  }

  private def mkWriter(root: VectorSchemaRoot, codec: Option[String],
      out: ByteArrayOutputStream): ArrowStreamWriter = codec match {
    case None => new ArrowStreamWriter(root, null, out)
    case Some(c) =>
      val codecType = c.toLowerCase match {
        case "zstd" => CompressionUtil.CodecType.ZSTD
        case "lz4" => CompressionUtil.CodecType.LZ4_FRAME
        case other => throw new IllegalArgumentException(
          s"unsupported IPC codec: $other (zstd, lz4)")
      }
      new ArrowStreamWriter(root, null,
        java.nio.channels.Channels.newChannel(out),
        org.apache.arrow.vector.ipc.message.IpcOption.DEFAULT,
        CommonsCompressionFactory.INSTANCE, codecType)
  }

  /** Incremental chunked encode: emits a STANDALONE IPC stream (schema →
    * batches → EOS) with its row count whenever the running chunk crosses
    * `maxRows` rows OR `maxBytes` encoded bytes — whichever first. A result
    * under both caps emits exactly ONE chunk, and an empty result emits one
    * empty stream, so single-message consumers are unaffected until a
    * result actually needs chunking. The byte cap is the HARD backstop for
    * size-estimate misroutes: plan statistics can undershoot (joins,
    * explode), and without it an "estimated small" result would buffer
    * whole on the driver — here it degrades to more chunks, each decodable
    * on its own. Returns the number of chunks emitted (≥ 1).
    */
  def toIpcChunked(df: DataFrame, codec: Option[String], maxRows: Long, maxBytes: Long)
      (emit: (Array[Byte], Long) => Unit): Int = {
    val schema = df.schema
    val it = df.toLocalIterator().asScala
    val allocator = new RootAllocator()
    var chunks = 0
    try {
      val arrowSchema = new ArrowSchema(schema.fields.map(arrowField).toList.asJava)
      val root = VectorSchemaRoot.create(arrowSchema, allocator)
      try {
        var out: ByteArrayOutputStream = null
        var writer: ArrowStreamWriter = null
        var rows = 0L
        def open(): Unit = {
          out = new ByteArrayOutputStream()
          writer = mkWriter(root, codec, out)
          writer.start()
          rows = 0L
        }
        def closeAndEmit(): Unit = {
          writer.end(); writer.close()
          emit(out.toByteArray, rows)
          chunks += 1
          writer = null; out = null
        }
        open()
        val buf = new scala.collection.mutable.ArrayBuffer[Row](BatchRows)
        while (it.hasNext) {
          if (writer == null) open()
          buf.clear()
          while (it.hasNext && buf.length < BatchRows) buf += it.next()
          root.allocateNew()
          schema.fields.zipWithIndex.foreach { case (f, c) =>
            val v = root.getVector(c)
            var r = 0
            buf.foreach { row =>
              if (row.isNullAt(c)) setNull(v, r) else setValue(v, r, f.dataType, row, c)
              r += 1
            }
            v.setValueCount(buf.length)
          }
          root.setRowCount(buf.length)
          writer.writeBatch()
          rows += buf.length
          if (rows >= maxRows || out.size() >= maxBytes) closeAndEmit()
        }
        if (writer != null) closeAndEmit() // final partial, or the empty stream
        chunks
      } finally root.close()
    } finally allocator.close()
  }

  /** Decode an Arrow IPC stream into a DataFrame (all batches). */
  def fromIpcBytes(spark: SparkSession, bytes: Array[Byte]): DataFrame =
    fromIpcBytesWithCount(spark, bytes)._1

  /** [[fromIpcBytes]] plus the decoded row count — the count is known from
    * the batch metadata, so ingest paths can skip the one-job-per-chunk
    * `count()` the micro-batcher would otherwise run.
    */
  def fromIpcBytesWithCount(spark: SparkSession, bytes: Array[Byte]): (DataFrame, Long) = {
    val allocator = new RootAllocator()
    try {
      // The compression factory makes the reader transparently decompress
      // zstd/lz4 record batches; uncompressed streams read unchanged.
      val reader = new ArrowStreamReader(new ByteArrayInputStream(bytes), allocator,
        CommonsCompressionFactory.INSTANCE)
      try {
        val root = reader.getVectorSchemaRoot
        val schema = StructType(root.getSchema.getFields.asScala.map(sparkField).toArray)
        val out = scala.collection.mutable.ArrayBuffer[Row]()
        while (reader.loadNextBatch()) {
          (0 until root.getRowCount).foreach { r =>
            out += Row.fromSeq(schema.fields.indices.map { c =>
              getValue(root.getVector(c), r, schema.fields(c).dataType)
            })
          }
        }
        (spark.createDataFrame(out.asJava, schema), out.length.toLong)
      } finally reader.close()
    } finally allocator.close()
  }

  private def setNull(v: FieldVector, r: Int): Unit = v match {
    case x: BitVector => x.setNull(r)
    case x: IntVector => x.setNull(r)
    case x: BigIntVector => x.setNull(r)
    case x: Float4Vector => x.setNull(r)
    case x: Float8Vector => x.setNull(r)
    case x: VarCharVector => x.setNull(r)
    case x: VarBinaryVector => x.setNull(r)
    case x: TimeStampMicroTZVector => x.setNull(r)
    case x: TimeStampMicroVector => x.setNull(r)
    case x: DateDayVector => x.setNull(r)
    case other => throw new IllegalArgumentException(s"unsupported vector: $other")
  }

  private def setValue(v: FieldVector, r: Int, dt: DataType, row: Row, c: Int): Unit =
    (v, dt) match {
      case (x: BitVector, BooleanType) => x.setSafe(r, if (row.getBoolean(c)) 1 else 0)
      case (x: IntVector, IntegerType) => x.setSafe(r, row.getInt(c))
      case (x: BigIntVector, LongType) => x.setSafe(r, row.getLong(c))
      case (x: Float4Vector, FloatType) => x.setSafe(r, row.getFloat(c))
      case (x: Float8Vector, DoubleType) => x.setSafe(r, row.getDouble(c))
      case (x: VarCharVector, StringType) => x.setSafe(r, new Text(row.getString(c)))
      case (x: VarBinaryVector, BinaryType) => x.setSafe(r, row.getAs[Array[Byte]](c))
      case (x: TimeStampMicroTZVector, TimestampType) =>
        val ts = row.getTimestamp(c)
        x.setSafe(r, ts.getTime * 1000L + (ts.getNanos % 1000000L) / 1000L)
      case (x: TimeStampMicroVector, TimestampNTZType) =>
        val ldt = row.getAs[java.time.LocalDateTime](c)
        val us = ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + ldt.getNano / 1000L
        x.setSafe(r, us)
      case (x: DateDayVector, DateType) =>
        x.setSafe(r, row.getDate(c).toLocalDate.toEpochDay.toInt)
      case (other, t) => throw new IllegalArgumentException(s"unsupported: $other/$t")
    }

  private def getValue(v: FieldVector, r: Int, dt: DataType): Any =
    if (v.isNull(r)) null
    else (v, dt) match {
      case (x: BitVector, BooleanType) => x.get(r) == 1
      case (x: IntVector, IntegerType) => x.get(r)
      case (x: BigIntVector, LongType) => x.get(r)
      case (x: Float4Vector, FloatType) => x.get(r)
      case (x: Float8Vector, DoubleType) => x.get(r)
      case (x: VarCharVector, StringType) => new String(x.get(r), java.nio.charset.StandardCharsets.UTF_8)
      case (x: VarBinaryVector, BinaryType) => x.get(r)
      case (x: TimeStampMicroTZVector, TimestampType) =>
        val us = x.get(r)
        val ts = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
        ts.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
        ts
      case (x: TimeStampMicroVector, TimestampNTZType) =>
        val us = x.get(r)
        java.time.LocalDateTime.ofEpochSecond(
          Math.floorDiv(us, 1000000L), (Math.floorMod(us, 1000000L) * 1000L).toInt,
          java.time.ZoneOffset.UTC)
      case (x: DateDayVector, DateType) =>
        java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(x.get(r).toLong))
      case (other, t) => throw new IllegalArgumentException(s"unsupported: $other/$t")
    }
}
