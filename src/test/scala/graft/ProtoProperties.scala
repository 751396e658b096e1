package graft

import org.scalacheck.{Arbitrary, Gen, Prop, Properties}

import graft.sources.ProtoCodec._

/** Property tests for the hand-rolled proto3 codec: encode→decode identity
  * under arbitrary field values (unicode strings, empty/huge payloads,
  * varint edge magnitudes). ProtoGoldenSpec pins the exact WIRE bytes; this
  * pins totality — no value a caller can construct desyncs the reader.
  */
object ProtoProperties extends Properties("ProtoCodec") {

  private val str: Gen[String] = Gen.oneOf(
    Gen.const(""),
    Gen.alphaNumStr.map(_.take(40)),
    Gen.const("naïve — ünïcødé ☃ 中文"),
    Gen.listOfN(500, Gen.asciiPrintableChar).map(_.mkString))

  private val strs: Gen[Seq[String]] = Gen.listOf(str).map(_.take(8))

  private val bytes: Gen[Array[Byte]] = Gen.oneOf(
    Gen.const(Array.emptyByteArray),
    Gen.listOfN(64, Arbitrary.arbByte.arbitrary).map(_.toArray),
    Gen.const(Array.tabulate(4096)(i => (i % 251).toByte)))

  private val uint: Gen[Long] = Gen.oneOf(
    Gen.const(0L), Gen.const(1L), Gen.const(127L), Gen.const(128L),
    Gen.const(16383L), Gen.const(16384L), Gen.choose(0L, Long.MaxValue))

  private val qid: Gen[Option[Int]] =
    Gen.option(Gen.oneOf(Gen.const(0), Gen.choose(0, Int.MaxValue)))

  property("Message round-trips") = Prop.forAll(str) { m =>
    PbMessage.decode(PbMessage(m).encode) == PbMessage(m)
  }

  property("Table round-trips") = Prop.forAll(str, str) { (s, t) =>
    PbTable.decode(PbTable(s, t).encode) == PbTable(s, t)
  }

  property("TableInfo round-trips") =
    Prop.forAll(strs, strs, uint, Gen.choose(0, Int.MaxValue)) { (cs, ds, rows, parts) =>
      val m = PbTableInfo(cs, ds, rows, parts)
      PbTableInfo.decode(m.encode) == m
    }

  property("SourceIpc round-trips") =
    Prop.forAll(str, str, bytes, strs, strs, strs) { (s, t, b, ps, bs, ks) =>
      val m = PbSourceIpc(s, t, b, ps, bs, ks)
      val d = PbSourceIpc.decode(m.encode)
      d.copy(data = Array.emptyByteArray) == m.copy(data = Array.emptyByteArray) &&
        d.data.toSeq == b.toSeq
    }

  property("Sql round-trips (qid presence preserved, including zero)") =
    Prop.forAll(str, qid) { (sql, q) =>
      PbSql.decode(PbSql(sql, q).encode) == PbSql(sql, q)
    }

  property("SqlResults round-trips") =
    Prop.forAll(bytes, uint, strs, strs, qid) { (b, rows, cs, ds, q) =>
      val m = PbSqlResults(b, rows, cs, ds, q)
      val d = PbSqlResults.decode(m.encode)
      d.copy(data = Array.emptyByteArray) == m.copy(data = Array.emptyByteArray) &&
        d.data.toSeq == b.toSeq
    }

  property("decoder skips unknown fields injected between known ones") =
    Prop.forAll(str, uint) { (msg, extra) =>
      // field 12 varint + field 13 bytes, spliced after field 1.
      val w = new Writer
      w.str(1, msg)
      w.uintPresent(12, extra)
      w.bytes(13, Array[Byte](1, 2, 3))
      PbMessage.decode(w.result()) == PbMessage(msg)
    }
}
