package graft

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.functions._

import graft.operators.Export

/** The tar-shard reader must INVERT the writer: member-exact round trip
  * (ids, texts, paired binary modalities), the documented null-text
  * contract, and loud failures on corrupt or truncated archives — a
  * half-parsed shard silently yielding partial rows would poison a
  * re-ingest.
  */
class WebdatasetImportSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Fixtures.table(spark, sf(), "documents")
    .withColumn("bin",
      when(col("doc_id") % 3 === 0, encode(substring(col("text"), 1, 16), "UTF-8")))

  private def export(root: String): Unit =
    Export.webdatasetWrite(corpus, "doc_id", "text", 4, root, binCol = Some("bin"))

  test("round trip: every id, text, and paired modality survives exactly") {
    val root = Files.createTempDirectory("wds_rt").toString
    export(root)
    val back = Export.webdatasetRead(spark, root)
      .select($"doc_id", $"text", $"bin", $"shard")
      .as[(Long, String, Array[Byte], Long)].collect()
    val src = corpus.select($"doc_id", $"text", $"bin")
      .as[(Long, String, Array[Byte])].collect()
    assert(back.length === src.length)
    val byId = back.map(r => r._1 -> r).toMap
    src.foreach { case (id, text, bin) =>
      val r = byId(id)
      assert(r._2 === text, s"text mismatch for $id")
      assert(Option(r._3).map(_.toSeq) === Option(bin).map(_.toSeq), s"bin mismatch for $id")
      assert(r._4 === id % 4, s"shard mismatch for $id")
    }
  }

  test("multi-byte UTF-8, empty, and newline-rich payloads round-trip byte-exactly") {
    val root = Files.createTempDirectory("wds_utf8").toString
    val df = Seq(
      (1L, "naïve café — übergroße 模型 🚀"),
      (2L, ""),
      (3L, "line one\nline two\r\nline three\ttabbed"),
      (4L, "x" * 511),   // payload one byte under the block boundary
      (5L, "y" * 512))   // payload exactly one block
      .toDF("doc_id", "text")
    Export.webdatasetWrite(df, "doc_id", "text", 2, root)
    val back = Export.webdatasetRead(spark, root)
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    val src = df.as[(Long, String)].collect().toMap
    assert(back === src)
  }

  test("null text exports as an empty member and reads back as the empty string") {
    val root = Files.createTempDirectory("wds_null").toString
    val df = Seq((1L, "alpha"), (2L, null: String), (3L, "gamma"))
      .toDF("doc_id", "text")
    Export.webdatasetWrite(df, "doc_id", "text", 1, root)
    val back = Export.webdatasetRead(spark, root)
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    assert(back === Map(1L -> "alpha", 2L -> "", 3L -> "gamma"))
  }

  test("truncated and corrupted archives fail loudly, never partial-parse") {
    val root = Files.createTempDirectory("wds_bad").toString
    export(root)
    val shard0 = Paths.get(root).resolve("shard-00000.tar")
    val full = Files.readAllBytes(shard0)
    // Hadoop's local FS keeps .crc sidecars; drop them so the PARSER'S
    // guards (not the checksum layer) are what the mutations exercise.
    def dropCrc(): Unit =
      Files.deleteIfExists(Paths.get(root).resolve(".shard-00000.tar.crc"))
    // Truncate mid-member: drop the trailing half of the archive.
    Files.write(shard0, full.take(full.length / 2 / 512 * 512 + 256),
      StandardOpenOption.TRUNCATE_EXISTING)
    dropCrc()
    val e1 = intercept[org.apache.spark.SparkException] {
      Export.webdatasetRead(spark, root).count()
    }
    assert(e1.getMessage.contains("truncated tar"), e1.getMessage)
    // Corrupt the ustar magic of the first member.
    val bad = full.clone(); bad(257) = 'X'.toByte
    Files.write(shard0, bad, StandardOpenOption.TRUNCATE_EXISTING)
    dropCrc()
    val e2 = intercept[org.apache.spark.SparkException] {
      Export.webdatasetRead(spark, root).count()
    }
    assert(e2.getMessage.contains("not ustar"), e2.getMessage)
    // An empty root refuses rather than returning an empty frame.
    val e3 = intercept[IllegalArgumentException] {
      Export.webdatasetRead(spark, Files.createTempDirectory("wds_empty").toString)
    }
    assert(e3.getMessage.contains("no shard-"), e3.getMessage)
  }
}
