package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8

/** Hand-rolled protobuf (proto3) wire codec for the reference's six RPC
  * message types (reference: proto/db.proto:37-73). The container has no
  * protoc, so the messages are encoded/decoded directly against the public
  * protobuf wire format: `tag = (field << 3) | wireType`, wire type 0 =
  * varint (uint32), 2 = length-delimited (string / bytes / nested). Every
  * field in db.proto is one of those two, which keeps this codec ~100 lines
  * and byte-compatible with protoc-generated stubs on the other end of the
  * socket (the reference's Python clients, call.py:27-79).
  */
object ProtoCodec {

  final class Writer {
    private val out = new ByteArrayOutputStream()
    def result(): Array[Byte] = out.toByteArray

    def varint(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7fL) != 0L) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
      out.write(v.toInt)
    }
    private def tag(field: Int, wt: Int): Unit = varint((field.toLong << 3) | wt)
    /** proto3 scalar fields skip default values. */
    def uint(field: Int, v: Long): Unit = if (v != 0L) { tag(field, 0); varint(v) }
    /** presence-tracked (`optional`) fields encode defaults too. */
    def uintPresent(field: Int, v: Long): Unit = { tag(field, 0); varint(v) }
    def bytes(field: Int, b: Array[Byte]): Unit =
      if (b != null && b.nonEmpty) { tag(field, 2); varint(b.length.toLong); out.write(b) }
    def str(field: Int, s: String): Unit =
      if (s != null && s.nonEmpty) bytes(field, s.getBytes(UTF_8))
    /** Repeated string field: EVERY element encodes, including empty ones —
      * proto3's skip-defaults rule applies to singular fields only; protoc
      * encodes a length-0 element for "" in a repeated field, and dropping
      * it would silently shift the receiver's element positions
      * (ProtoProperties pins the round trip).
      */
    def strs(field: Int, ss: Seq[String]): Unit = ss.foreach { s =>
      val b = s.getBytes(UTF_8)
      tag(field, 2); varint(b.length.toLong); out.write(b)
    }
  }

  final class Reader(buf: Array[Byte]) {
    private var pos = 0
    def hasNext: Boolean = pos < buf.length
    def varint(): Long = {
      var shift = 0; var v = 0L
      while (true) {
        val b = buf(pos); pos += 1
        v |= (b & 0x7fL) << shift
        if ((b & 0x80) == 0) return v
        shift += 7
      }
      v
    }
    /** Returns (fieldNumber, wireType). */
    def readTag(): (Int, Int) = { val t = varint().toInt; (t >>> 3, t & 7) }
    def lenDelim(): Array[Byte] = {
      val n = varint().toInt
      val b = java.util.Arrays.copyOfRange(buf, pos, pos + n)
      pos += n
      b
    }
    def string(): String = new String(lenDelim(), UTF_8)
    def skip(wt: Int): Unit = wt match {
      case 0 => varint(); ()
      case 1 => pos += 8
      case 2 =>
        // NOT `pos += varint().toInt`: += reads the old pos BEFORE varint()
        // advances it, silently dropping the length prefix's own width and
        // desyncing every later field (caught by ProtoGoldenSpec's
        // unknown-field pin).
        val n = varint().toInt
        pos += n
      case 5 => pos += 4
      case other => throw new IllegalArgumentException(s"wire type $other")
    }
  }

  // ------------------------------------------------------------- messages

  /** proto `Message` (db.proto:37-39). */
  final case class PbMessage(message: String) {
    def encode: Array[Byte] = { val w = new Writer; w.str(1, message); w.result() }
  }
  object PbMessage {
    def decode(b: Array[Byte]): PbMessage = {
      var msg = ""
      val r = new Reader(b)
      while (r.hasNext) r.readTag() match {
        case (1, 2) => msg = r.string()
        case (_, wt) => r.skip(wt)
      }
      PbMessage(msg)
    }
  }

  /** proto `Table` (db.proto:45-48). */
  final case class PbTable(schema: String, table: String) {
    def encode: Array[Byte] = {
      val w = new Writer; w.str(1, schema); w.str(2, table); w.result()
    }
  }
  object PbTable {
    def decode(b: Array[Byte]): PbTable = {
      var schema = ""; var table = ""
      val r = new Reader(b)
      while (r.hasNext) r.readTag() match {
        case (1, 2) => schema = r.string()
        case (2, 2) => table = r.string()
        case (_, wt) => r.skip(wt)
      }
      PbTable(schema, table)
    }
  }

  /** proto `TableInfo` (db.proto:50-55). */
  final case class PbTableInfo(columns: Seq[String], dtypes: Seq[String], rows: Long, parts: Int) {
    def encode: Array[Byte] = {
      val w = new Writer
      w.strs(1, columns); w.strs(2, dtypes); w.uint(3, rows); w.uint(4, parts.toLong)
      w.result()
    }
  }
  object PbTableInfo {
    def decode(b: Array[Byte]): PbTableInfo = {
      val cols = Seq.newBuilder[String]; val dts = Seq.newBuilder[String]
      var rows = 0L; var parts = 0
      val r = new Reader(b)
      while (r.hasNext) r.readTag() match {
        case (1, 2) => cols += r.string()
        case (2, 2) => dts += r.string()
        case (3, 0) => rows = r.varint()
        case (4, 0) => parts = r.varint().toInt
        case (_, wt) => r.skip(wt)
      }
      PbTableInfo(cols.result(), dts.result(), rows, parts)
    }
  }

  /** proto `SourceIpc` (db.proto:57-64). */
  final case class PbSourceIpc(
      schema: String, table: String, data: Array[Byte],
      partitions: Seq[String] = Nil, buckets: Seq[String] = Nil, keys: Seq[String] = Nil) {
    def encode: Array[Byte] = {
      val w = new Writer
      w.str(1, schema); w.str(2, table); w.bytes(3, data)
      w.strs(4, partitions); w.strs(5, buckets); w.strs(6, keys)
      w.result()
    }
  }
  object PbSourceIpc {
    def decode(b: Array[Byte]): PbSourceIpc = {
      var schema = ""; var table = ""; var data = Array.empty[Byte]
      val parts = Seq.newBuilder[String]; val buckets = Seq.newBuilder[String]
      val keys = Seq.newBuilder[String]
      val r = new Reader(b)
      while (r.hasNext) r.readTag() match {
        case (1, 2) => schema = r.string()
        case (2, 2) => table = r.string()
        case (3, 2) => data = r.lenDelim()
        case (4, 2) => parts += r.string()
        case (5, 2) => buckets += r.string()
        case (6, 2) => keys += r.string()
        case (_, wt) => r.skip(wt)
      }
      PbSourceIpc(schema, table, data, parts.result(), buckets.result(), keys.result())
    }
  }

  /** proto `Sql` (db.proto:66-69). */
  final case class PbSql(sql: String, qid: Option[Int] = None) {
    def encode: Array[Byte] = {
      val w = new Writer; w.str(1, sql); qid.foreach(q => w.uintPresent(2, q.toLong)); w.result()
    }
  }
  object PbSql {
    def decode(b: Array[Byte]): PbSql = {
      var sql = ""; var qid: Option[Int] = None
      val r = new Reader(b)
      while (r.hasNext) r.readTag() match {
        case (1, 2) => sql = r.string()
        case (2, 0) => qid = Some(r.varint().toInt)
        case (_, wt) => r.skip(wt)
      }
      PbSql(sql, qid)
    }
  }

  /** proto `SqlResults` (db.proto:71-77). */
  final case class PbSqlResults(
      data: Array[Byte], rows: Long, columns: Seq[String], dtypes: Seq[String],
      qid: Option[Int] = None) {
    def encode: Array[Byte] = {
      val w = new Writer
      w.bytes(1, data); w.uint(2, rows); w.strs(3, columns); w.strs(4, dtypes)
      qid.foreach(q => w.uintPresent(5, q.toLong))
      w.result()
    }
  }
  object PbSqlResults {
    def decode(b: Array[Byte]): PbSqlResults = {
      var data = Array.empty[Byte]; var rows = 0L
      val cols = Seq.newBuilder[String]; val dts = Seq.newBuilder[String]
      var qid: Option[Int] = None
      val r = new Reader(b)
      while (r.hasNext) r.readTag() match {
        case (1, 2) => data = r.lenDelim()
        case (2, 0) => rows = r.varint()
        case (3, 2) => cols += r.string()
        case (4, 2) => dts += r.string()
        case (5, 0) => qid = Some(r.varint().toInt)
        case (_, wt) => r.skip(wt)
      }
      PbSqlResults(data, rows, cols.result(), dts.result(), qid)
    }
  }
}
