package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Export

/** Deterministic shard export (Export.shardedWrite): reproducibility,
  * lossless round trip, assignment law, balance of the hashed mode.
  */
class ExportSpec extends SparkSpec {

  private def docs: DataFrame = Fixtures.table(spark, sf(), "documents")

  private def writeOnce(hashed: Boolean): (String, DataFrame) = {
    val root = java.nio.file.Files.createTempDirectory("graft_export_spec").toString
    (root, Export.shardedWrite(docs, "doc_id", 8, root, hashed))
  }

  test("re-read equals the source; residue mode matches id % n exactly") {
    val (_, out) = writeOnce(hashed = false)
    assert(out.count() == docs.count())
    // Lossless: every column survives, content identical.
    assert(out.drop("shard").exceptAll(docs).count() == 0L)
    assert(docs.exceptAll(out.drop("shard")).count() == 0L)
    // Assignment law, recomputable by any engine.
    assert(out.filter(col("shard").cast("long") =!=
      pmod(col("doc_id"), lit(8L))).count() == 0L)
  }

  test("JSONL export: one object per line, lossless under the written schema") {
    val root = java.nio.file.Files.createTempDirectory("graft_export_jl").toString
    val out = Export.shardedWrite(docs, "doc_id", 8, root,
      hashed = false, format = "json")
    // lossless round trip including multi-line text (JSON escapes \n)
    assert(out.count() == docs.count())
    assert(out.drop("shard").exceptAll(docs).count() == 0L)
    assert(docs.exceptAll(out.drop("shard")).count() == 0L)
    // the files really are JSONL: one parseable object per non-empty line
    val aFile = java.nio.file.Files.list(java.nio.file.Paths.get(s"$root/shard=0"))
      .iterator().asScala.find(_.toString.endsWith(".json"))
      .getOrElse(fail("no .json part file written"))
    val lines = java.nio.file.Files.readAllLines(aFile).asScala.filter(_.nonEmpty)
    assert(lines.nonEmpty)
    assert(lines.forall(l => l.startsWith("{") && l.endsWith("}")),
      "every line must be one JSON object")
  }

  test("two hashed exports produce identical per-shard ordered content") {
    val (rootA, _) = writeOnce(hashed = true)
    // Second run over a differently-ordered input: determinism must come
    // from the data, not the incoming row order.
    val rootB = java.nio.file.Files.createTempDirectory("graft_export_spec").toString
    Export.shardedWrite(docs.orderBy(desc("n_chars")), "doc_id", 8, rootB,
      hashed = true)
    for (shard <- 0 until 8) {
      val a = spark.read.parquet(s"$rootA/shard=$shard")
        .select("doc_id").collect().map(_.getLong(0)).toSeq
      val b = spark.read.parquet(s"$rootB/shard=$shard")
        .select("doc_id").collect().map(_.getLong(0)).toSeq
      assert(a == b, s"shard $shard differs between runs")
      assert(a.nonEmpty)
    }
  }

  test("the exchange gives one task per shard at wide nShards") {
    // Hash-partitioning the shard id maps through hash(k) % n (not
    // identity) — at nShards=64 many tasks would hold 2+ shards while
    // others sat empty. The inverse-hash route must keep exactly one shard
    // per task, every task populated. (AQE's small-partition coalescing is
    // disabled for the assertion — at real shard sizes it never engages.)
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val prev = spark.conf.get(coalesceKey)
    try {
      spark.conf.set(coalesceKey, "false")
      val n = 64
      val route = Export.routeFor(n)
      val routed = docs
        .withColumn("shard", Export.shardColumn(col("doc_id"), n, hashed = true))
        .repartition(n, element_at(lit(route), col("shard").cast("int") + 1))
      val perTask = routed
        .groupBy(spark_partition_id().as("task"))
        .agg(countDistinct(col("shard")).as("shards"), count(lit(1)).as("rows"))
        .collect()
      assert(perTask.forall(_.getAs[Long]("shards") == 1L),
        s"task holds >1 shard: ${perTask.map(_.toSeq).toList}")
      assert(perTask.length == n,
        s"expected $n non-empty tasks, got ${perTask.length}")
      // The route is what the writer actually uses — and it IS a bijection.
      assert(route.distinct.length == n)
    } finally spark.conf.set(coalesceKey, prev)
  }

  test("webdataset tars round-trip: members parse, order holds, manifest bytes exact") {
    val root = java.nio.file.Files.createTempDirectory("graft_wd_spec").toString
    val manifest = Export.webdatasetWrite(docs, "doc_id", "text", 4, root)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    val truth = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(manifest.keySet == truth.keySet.map(_ % 4))
    // Minimal independent USTAR parser (not the writer's code path).
    def parseTar(path: String): Seq[(String, Array[Byte])] = {
      val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
      val out = Seq.newBuilder[(String, Array[Byte])]
      var off = 0
      while (off + 512 <= bytes.length &&
          bytes.slice(off, off + 512).exists(_ != 0)) {
        val name = new String(bytes.slice(off, off + 100).takeWhile(_ != 0),
          java.nio.charset.StandardCharsets.US_ASCII)
        val size = java.lang.Long.parseLong(new String(
          bytes.slice(off + 124, off + 135)).trim, 8)
        assert(new String(bytes.slice(off + 257, off + 262)) == "ustar")
        // Verify the header checksum the POSIX way (chksum field as spaces).
        val hdr = bytes.slice(off, off + 512)
        for (i <- 148 until 156) hdr(i) = ' '.toByte
        val want = java.lang.Integer.parseInt(new String(
          bytes.slice(off + 148, off + 154)).trim, 8)
        assert(hdr.map(_ & 0xff).sum == want, s"checksum broke for $name")
        out += name -> bytes.slice(off + 512, off + 512 + size.toInt)
        off += 512 + ((size.toInt + 511) / 512) * 512
      }
      out.result()
    }
    var parsed = 0L
    for ((shard, (n, nBytes, path)) <- manifest) {
      assert(new java.io.File(path).length() == nBytes,
        s"manifest bytes drift for shard $shard")
      val members = parseTar(path)
      assert(members.length.toLong == n)
      // Deterministic id order inside the archive.
      assert(members.map(_._1) == members.map(_._1).sorted)
      members.foreach { case (name, payload) =>
        val id = name.stripSuffix(".txt").toLong
        assert(id % 4 == shard, s"member $name in wrong shard")
        assert(new String(payload, java.nio.charset.StandardCharsets.UTF_8)
          == truth(id), s"payload drift for $name")
      }
      parsed += members.length
    }
    assert(parsed == truth.size.toLong, "every document lands in exactly one shard")
    // Re-export is byte-identical (deterministic headers, order, framing).
    val root2 = java.nio.file.Files.createTempDirectory("graft_wd_spec2").toString
    val again = Export.webdatasetWrite(docs, "doc_id", "text", 4, root2)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    for ((shard, (_, _, path)) <- manifest) {
      val a = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
      val b = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(again(shard)))
      assert(java.util.Arrays.equals(a, b), s"re-export drifted for shard $shard")
    }
  }

  test("webdataset multimodal members pair by key prefix; null modality skips its member") {
    val withBin = docs.select(col("doc_id"), col("text"),
      when(col("doc_id") % 3 === 0, lit(null).cast("binary"))
        .otherwise(unhex(md5(col("text")))).as("img"))
    val root = java.nio.file.Files.createTempDirectory("graft_wd_mm").toString
    val manifest = Export.webdatasetWrite(withBin, "doc_id", "text", 2, root,
      binCol = Some("img")).collect()
    val nDocs = docs.count()
    assert(manifest.map(_.getAs[Long]("n_samples")).sum == nDocs)
    for (row <- manifest) {
      val path = row.getAs[String]("path")
      assert(new java.io.File(path).length() == row.getAs[Long]("n_bytes"))
      val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
      // Walk member names in order; bin (16 md5 bytes) precedes its txt.
      var off = 0
      var names = List.empty[String]
      while (off + 512 <= bytes.length &&
          bytes.slice(off, off + 512).exists(_ != 0)) {
        val name = new String(bytes.slice(off, off + 100).takeWhile(_ != 0),
          java.nio.charset.StandardCharsets.US_ASCII)
        val size = java.lang.Long.parseLong(new String(
          bytes.slice(off + 124, off + 135)).trim, 8)
        if (name.endsWith(".bin")) assert(size == 16L, s"$name md5 size")
        names ::= name
        off += 512 + ((size.toInt + 511) / 512) * 512
      }
      val ordered = names.reverse
      ordered.sliding(2).foreach {
        case List(a, b) if a.endsWith(".bin") =>
          assert(b == a.stripSuffix(".bin") + ".txt",
            s"modality $a not adjacent to its text member")
        case _ =>
      }
      val keys = ordered.map(_.take(9).toLong)
      ordered.foreach { nm =>
        val id = nm.take(9).toLong
        assert(nm.endsWith(".txt") || id % 3 != 0,
          s"null-modality doc $id must not emit a .bin member")
      }
      assert(keys.filter(_ % 3 == 0).distinct.forall(id =>
        ordered.count(_.startsWith(f"$id%09d")) == 1))
      assert(keys.filterNot(_ % 3 == 0).distinct.forall(id =>
        ordered.count(_.startsWith(f"$id%09d")) == 2))
    }
  }

  test("hashed shards are balanced and each shard is one file") {
    val (root, out) = writeOnce(hashed = true)
    val sizes = out.groupBy("shard").count().collect()
      .map(_.getAs[Long]("count"))
    assert(sizes.length == 8)
    val avg = sizes.sum.toDouble / sizes.length
    assert(sizes.max < 2 * avg, s"skewed shards: ${sizes.toList}")
    for (shard <- 0 until 8) {
      val files = new java.io.File(s"$root/shard=$shard")
        .listFiles().count(_.getName.endsWith(".parquet"))
      assert(files == 1, s"shard $shard split across $files files")
    }
  }
}
