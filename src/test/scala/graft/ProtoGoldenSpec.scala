package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.ProtoCodec._

/** Golden-bytes pins for the hand-rolled proto3 codec: each message type's
  * encoding asserted against bytes computed from the protobuf wire spec by
  * hand (tag = (field << 3) | wireType; varint; length-delimited). Interop
  * with protoc-generated stubs (the reference's Python call.py) rests on
  * these exact bytes, not on our encode/decode agreeing with itself — a
  * symmetric codec bug round-trips fine and still breaks every real client.
  */
class ProtoGoldenSpec extends AnyFunSuite {

  private def hex(bs: Array[Byte]): String = bs.map("%02x".format(_)).mkString(" ")
  private def golden(expected: Int*): Array[Byte] = expected.map(_.toByte).toArray

  private def assertBytes(actual: Array[Byte], expected: Array[Byte]): Unit =
    assert(hex(actual) == hex(expected))

  test("Message golden bytes") {
    val g = golden(0x0a, 0x02, 'o', 'k')
    assertBytes(PbMessage("ok").encode, g)
    assert(PbMessage.decode(g) == PbMessage("ok"))
  }

  test("Table golden bytes") {
    val g = golden(
      0x0a, 0x06, 'p', 'u', 'b', 'l', 'i', 'c',
      0x12, 0x01, 't')
    assertBytes(PbTable("public", "t").encode, g)
    assert(PbTable.decode(g) == PbTable("public", "t"))
  }

  test("TableInfo golden bytes: repeated strings + multi-byte varint") {
    val g = golden(
      0x0a, 0x01, 'k', 0x0a, 0x01, 'v',                       // columns
      0x12, 0x06, 'b', 'i', 'g', 'i', 'n', 't',               // dtypes[0]
      0x12, 0x06, 'd', 'o', 'u', 'b', 'l', 'e',               // dtypes[1]
      0x18, 0xac, 0x02,                                       // rows = 300
      0x20, 0x03)                                             // parts = 3
    val m = PbTableInfo(Seq("k", "v"), Seq("bigint", "double"), 300L, 3)
    assertBytes(m.encode, g)
    assert(PbTableInfo.decode(g) == m)
  }

  test("SourceIpc golden bytes: all six fields") {
    val g = golden(
      0x0a, 0x01, 's',
      0x12, 0x01, 't',
      0x1a, 0x02, 0x01, 0x02,   // data
      0x22, 0x01, 'p',          // partitions
      0x2a, 0x01, 'b',          // buckets
      0x32, 0x01, 'k')          // keys
    val m = PbSourceIpc("s", "t", Array[Byte](1, 2), Seq("p"), Seq("b"), Seq("k"))
    assertBytes(m.encode, g)
    val d = PbSourceIpc.decode(g)
    assert(d.copy(data = Array.emptyByteArray) == m.copy(data = Array.emptyByteArray))
    assert(d.data.toSeq == Seq[Byte](1, 2))
  }

  test("Sql golden bytes: optional qid present (even when zero) vs absent") {
    val withZeroQid = golden(
      0x0a, 0x08, 'S', 'E', 'L', 'E', 'C', 'T', ' ', '1',
      0x10, 0x00) // presence-tracked optional: zero still encodes
    assertBytes(PbSql("SELECT 1", Some(0)).encode, withZeroQid)
    assert(PbSql.decode(withZeroQid) == PbSql("SELECT 1", Some(0)))

    val noQid = golden(0x0a, 0x01, 'x')
    assertBytes(PbSql("x", None).encode, noQid)
    assert(PbSql.decode(noQid) == PbSql("x", None))
  }

  test("SqlResults golden bytes") {
    val g = golden(
      0x0a, 0x01, 0xff,         // data
      0x10, 0x01,               // rows = 1
      0x1a, 0x01, 'c',          // columns
      0x22, 0x03, 'i', 'n', 't', // dtypes
      0x28, 0x07)               // qid = 7
    val m = PbSqlResults(Array(0xff.toByte), 1L, Seq("c"), Seq("int"), Some(7))
    assertBytes(m.encode, g)
    val d = PbSqlResults.decode(g)
    assert(d.copy(data = Array.emptyByteArray) == m.copy(data = Array.emptyByteArray))
    assert(d.data.toSeq == Seq(0xff.toByte))
  }

  test("proto3 scalar defaults are omitted; empty message is zero bytes") {
    assert(PbSqlResults(Array.emptyByteArray, 0L, Nil, Nil, None).encode.isEmpty)
    assert(PbMessage("").encode.isEmpty)
    val d = PbSqlResults.decode(Array.emptyByteArray)
    assert(d.rows == 0L && d.qid.isEmpty && d.columns.isEmpty)
  }

  test("varint boundaries survive encode/decode at 7-bit edges") {
    // 127/128 is the 1->2 byte edge; 2^40 exercises the long tail.
    for (v <- Seq(0L, 1L, 127L, 128L, 16383L, 16384L, 1L << 40)) {
      val m = PbTableInfo(Nil, Nil, v, 0)
      assert(PbTableInfo.decode(m.encode).rows == v, s"rows=$v")
    }
    // Golden pin for the edge itself: 128 = 0x80 0x01.
    assertBytes(PbTableInfo(Nil, Nil, 128L, 0).encode, golden(0x18, 0x80, 0x01))
  }

  test("unknown fields skip cleanly (forward compatibility)") {
    // A future server adds field 9 (varint) and field 10 (bytes): old
    // decoders must skip both and still read what they know.
    val g = golden(
      0x0a, 0x02, 'o', 'k',
      0x48, 0x2a,               // field 9, varint 42
      0x52, 0x02, 0x01, 0x02)   // field 10, 2 bytes
    assert(PbMessage.decode(g) == PbMessage("ok"))
  }
}
