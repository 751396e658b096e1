package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic shard export — the last stage of a training-data pipeline:
  * write a corpus as N shards whose ASSIGNMENT and per-shard ORDER are pure
  * functions of the data, so a re-run over the same input produces
  * comparable shards (resumable exports, reproducible training runs,
  * diffable re-exports after an upstream fix).
  *
  * Scale shape: ONE shuffle (repartition by shard id) and a sorted write —
  * no global sort, no driver-side pass. Each shard's rows land in exactly
  * one task (the shard id is the partitioning key), so each `shard=k`
  * directory holds one deterministic file regardless of cluster size.
  */
object Export {

  /** Shard id expression. `hashed=true` spreads arbitrary/clustered ids
    * uniformly via xxhash64; `hashed=false` uses the id's own residue
    * (portable arithmetic — any engine can recompute the assignment).
    */
  def shardColumn(idCol: Column, nShards: Int, hashed: Boolean = true): Column =
    if (hashed) pmod(xxhash64(idCol), lit(nShards.toLong))
    else pmod(idCol, lit(nShards.toLong))

  /** Per-shard route values whose HASH partition is exactly the shard id.
    *
    * `repartition(n, col("shard"))` maps a shard through
    * `murmur3(shard) % n`, which is NOT the identity — two shard ids can
    * collide into one task while other tasks sit empty (up to half the
    * write parallelism lost at large nShards), and range partitioning can't
    * pin it either (its sampled boundaries merge small shards). Instead,
    * invert the partitioner on the driver: for each shard k find a long
    * `r_k` with `murmur3(r_k) % n == k` — the exact Catalyst expression the
    * exchange evaluates — and route rows through `r_shard`. Expected cost
    * is n·ln(n) driver-side hash evals (coupon collector); the result is a
    * bijection, so EVERY task holds exactly one shard, always.
    */
  private[graft] def routeFor(nShards: Int): Array[Long] = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, Murmur3Hash, Pmod}
    val out = new Array[Long](nShards)
    val found = new Array[Boolean](nShards)
    var remaining = nShards
    var cand = 0L
    while (remaining > 0) {
      val part = Pmod(new Murmur3Hash(Seq(Literal(cand))), Literal(nShards))
        .eval(null).asInstanceOf[Int]
      if (!found(part)) { found(part) = true; out(part) = cand; remaining -= 1 }
      cand += 1L
    }
    out
  }

  /** Write `df` as `root/shard=K/` parquet shards, deterministically:
    * assignment by [[shardColumn]] over `idCol`, rows within a shard
    * ordered by (xxhash64(id), id) — an order that is stable, input-order-
    * independent, and uncorrelated with any data column (a free global
    * shuffle: training consumers reading shards sequentially see
    * hash-randomized document order, no "sorted by source" bias).
    * One shuffle, and via [[routeFor]] exactly one task per shard — full
    * write parallelism at any nShards. Returns the re-read of the written
    * tree — the caller summarizes or validates actual persisted bytes, not
    * the pre-write plan.
    */
  def shardedWrite(df: DataFrame, idCol: String, nShards: Int, root: String,
      hashed: Boolean = true, format: String = "parquet"): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val withShard = df.withColumn("shard", shardColumn(col(idCol), nShards, hashed))
    val route = routeFor(nShards)
    withShard
      .repartition(nShards, element_at(lit(route), col("shard").cast("int") + 1))
      .sortWithinPartitions(col("shard"), xxhash64(col(idCol)), col(idCol))
      .write.mode("overwrite").partitionBy("shard").format(format).save(root)
    // `format("json")` writes JSONL (one object per line) — the standard
    // LLM-training interchange shape; read back with the WRITTEN schema so
    // inference can neither retype columns nor drop all-null ones.
    val reader = df.sparkSession.read.option("basePath", root)
    (if (format == "parquet") reader
     else reader.schema(org.apache.spark.sql.types.StructType(
       withShard.schema.fields.filterNot(_.name == "shard"))))
      .format(format).load(root)
  }

  /** One deterministic 512-byte USTAR header. All metadata fields are
    * constants (mode 0644, uid/gid 0, mtime 0) so a re-export of the same
    * corpus produces byte-identical shards — the property that makes tar
    * shards diffable and resumable like the parquet/JSONL exports above.
    */
  private[graft] def tarHeader(name: String, size: Long): Array[Byte] = {
    val h = new Array[Byte](512)
    def put(s: String, off: Int, len: Int): Unit = {
      val b = s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      require(b.length <= len, s"tar field overflow: $s")
      System.arraycopy(b, 0, h, off, b.length)
    }
    put(name, 0, 100)
    put("0000644", 100, 8)
    put("0000000", 108, 8)
    put("0000000", 116, 8)
    put(f"$size%011o", 124, 12)
    put("00000000000", 136, 12)
    java.util.Arrays.fill(h, 148, 156, ' '.toByte) // checksum = spaces while summing
    h(156) = '0' // regular file
    put("ustar", 257, 6)
    put("00", 263, 2)
    var sum = 0L
    var i = 0
    while (i < 512) { sum += h(i) & 0xff; i += 1 }
    put(f"$sum%06o", 148, 7) // 6 octal digits + NUL (zero fill) ...
    h(155) = ' '.toByte      // ... + the trailing space POSIX prescribes
    h
  }

  /** WebDataset-style tar-shard export: each shard is ONE `.tar` whose
    * members are `{id}.txt` sample files in deterministic id order — the
    * layout streaming training loaders consume sequentially (no seeks, no
    * per-sample open cost). With `binCol` set, each sample additionally
    * carries its paired opaque-binary modality as `{id}.bin` ADJACENT to
    * its text member (the WebDataset key-prefix grouping loaders rely on);
    * null modalities skip the member. Assignment uses the PORTABLE residue
    * shard
    * (`id % nShards`) so any engine can recompute which shard holds a
    * document.
    *
    * Scale shape: the same ONE shuffle as [[shardedWrite]] (routed so every
    * task holds exactly one shard), then each task streams its archive
    * straight to the DRIVER-configured FileSystem (s3a/HDFS/local) — tar is
    * a sequential format, which is exactly why the per-partition imperative
    * seam (`mapPartitions`) is the right tool here and a columnar committer
    * is not. Returns the per-shard manifest (shard, n_samples, n_bytes,
    * path), with byte counts exact from the USTAR framing: 512-byte header
    * + payload padded to 512 per member, two zero blocks per archive.
    */
  def webdatasetWrite(df: DataFrame, idCol: String, textCol: String,
      nShards: Int, root: String, binCol: Option[String] = None): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val spark = df.sparkSession
    val route = routeFor(nShards)
    val confF = org.apache.spark.sql.graftbridge.Bridge.hadoopConfFactory(spark)
    val rootPath = new org.apache.hadoop.fs.Path(root)
    rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration).mkdirs(rootPath)
    val rows = df
      .select((Seq(col(idCol).cast("long").as("id"),
          col(textCol).cast("string").as("payload")) ++
        binCol.map(c => col(c).cast("binary").as("bin"))): _*)
      .withColumn("shard", shardColumn(col("id"), nShards, hashed = false))
      .repartition(nShards, element_at(lit(route), col("shard").cast("int") + 1))
      .sortWithinPartitions(col("shard"), col("id"))
    val shardIdx = if (binCol.isDefined) 3 else 2
    import spark.implicits._
    rows.mapPartitions { it =>
      if (!it.hasNext) Iterator.empty
      else {
        val conf = confF()
        val zeros = new Array[Byte](512)
        var out: org.apache.hadoop.fs.FSDataOutputStream = null
        var shard = -1L
        var n = 0L
        var bytes = 0L
        var path: String = null
        def member(name: String, payload: Array[Byte]): Unit = {
          out.write(tarHeader(name, payload.length.toLong))
          out.write(payload)
          val pad = (512 - payload.length % 512) % 512
          out.write(zeros, 0, pad)
          bytes += 512L + payload.length + pad
        }
        it.foreach { r =>
          if (out == null) {
            shard = r.getLong(shardIdx)
            path = s"$root/shard-${"%05d".format(shard)}.tar"
            val p = new org.apache.hadoop.fs.Path(path)
            out = p.getFileSystem(conf).create(p, true)
          }
          val key = f"${r.getLong(0)}%09d"
          // WebDataset groups a sample's members by shared key prefix —
          // the paired modality (when present) precedes the text member.
          // A null modality SKIPS its member (absent, not empty); a null
          // text exports as an empty member so the sample's KEY survives.
          if (shardIdx == 3 && !r.isNullAt(2))
            member(s"$key.bin", r.getAs[Array[Byte]](2))
          member(s"$key.txt", (if (r.isNullAt(1)) "" else r.getString(1))
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
          n += 1
        }
        out.write(zeros); out.write(zeros) // end-of-archive marker
        out.close()
        Iterator.single((shard, n, bytes + 1024L, path))
      }
    }.toDF("shard", "n_samples", "n_bytes", "path")
      // Materialize NOW: the manifest both reports and FORCES the write —
      // a lazy plan would re-run the archive job on every downstream read.
      .localCheckpoint(true)
  }

  /** WebDataset tar-shard IMPORT — the reader that completes
    * [[webdatasetWrite]]'s round trip, so tar shards are a SOURCE, not just
    * a sink (re-ingest an exported corpus, audit what a training run
    * actually consumed, or adopt shards produced by an external loader
    * pipeline).
    *
    * Scale shape mirrors the writer: one task per shard file, each task
    * STREAM-parses its archive sequentially from the driver-configured
    * FileSystem — tar has no index, sequential is the format's contract,
    * and the parse is a lazy iterator so a 1 GB shard never materializes
    * as a 1 GB task buffer; rows flow to the consumer as members decode.
    * This is the documented imperative seam (`mapPartitions`), exactly like
    * the writer's.
    *
    * Emits (doc_id, text, bin, shard): a `{key}.bin` member pairs into the
    * row of its adjacent-following `{key}.txt` (the WebDataset key-prefix
    * grouping); samples without a modality carry a null `bin`. A text
    * exported from NULL returns as the empty string — the writer's
    * documented contract (the KEY survives the round trip, the null does
    * not). Each member's ustar magic is verified and framing arithmetic is
    * strict (truncated archives fail loudly, never yield partial rows).
    */
  def webdatasetRead(spark: org.apache.spark.sql.SparkSession, root: String): DataFrame = {
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val shards = fs.globStatus(new org.apache.hadoop.fs.Path(rootPath, "shard-*.tar"))
      .map(_.getPath.toString).sorted.toSeq
    require(shards.nonEmpty, s"no shard-*.tar files under $root")
    val confF = org.apache.spark.sql.graftbridge.Bridge.hadoopConfFactory(spark)
    val shardRe = "shard-(\\d+)\\.tar$".r
    import spark.implicits._
    // parallelize with numSlices = nShards pins one archive per task — the
    // reader's parallelism equals the writer's, at any cluster size.
    spark.createDataset(spark.sparkContext.parallelize(shards, shards.size))
      .mapPartitions { paths =>
        val conf = confF()
        paths.flatMap { pathStr =>
          val shard = shardRe.findFirstMatchIn(pathStr)
            .map(_.group(1).toLong)
            .getOrElse(sys.error(s"unrecognized shard file name: $pathStr"))
          val p = new org.apache.hadoop.fs.Path(pathStr)
          val in = p.getFileSystem(conf).open(p)
          new Iterator[(Long, String, Array[Byte], Long)] {
            private val hdr = new Array[Byte](512)
            private var pendingKey = -1L
            private var pendingBin: Array[Byte] = null
            private var nextRow: (Long, String, Array[Byte], Long) = null
            private var closed = false
            private def readFully(buf: Array[Byte], len: Int): Unit = {
              var off = 0
              while (off < len) {
                val r = in.read(buf, off, len - off)
                require(r > 0, s"truncated tar archive: $pathStr")
                off += r
              }
            }
            private def advance(): Unit = {
              while (nextRow == null && !closed) {
                readFully(hdr, 512)
                if (hdr.forall(_ == 0)) { in.close(); closed = true }
                else {
                  var nameEnd = 0
                  while (nameEnd < 100 && hdr(nameEnd) != 0) nameEnd += 1
                  val name = new String(hdr, 0, nameEnd,
                    java.nio.charset.StandardCharsets.US_ASCII)
                  require(new String(hdr, 257, 5,
                    java.nio.charset.StandardCharsets.US_ASCII) == "ustar",
                    s"member '$name' in $pathStr is not ustar")
                  val size = java.lang.Long.parseLong(
                    new String(hdr, 124, 12,
                      java.nio.charset.StandardCharsets.US_ASCII)
                      .replaceAll("[^0-7]", ""), 8)
                  require(size >= 0 && size < (1L << 30),
                    s"member '$name' size $size out of range in $pathStr")
                  val payload = new Array[Byte](size.toInt)
                  readFully(payload, size.toInt)
                  val pad = ((512 - size % 512) % 512).toInt
                  if (pad > 0) readFully(hdr, pad)
                  val dot = name.lastIndexOf('.')
                  require(dot > 0, s"member '$name' has no extension in $pathStr")
                  val key = name.substring(0, dot).toLong
                  name.substring(dot) match {
                    case ".bin" =>
                      pendingKey = key; pendingBin = payload
                    case ".txt" =>
                      val bin = if (pendingKey == key) pendingBin else null
                      pendingKey = -1L; pendingBin = null
                      nextRow = (key, new String(payload,
                        java.nio.charset.StandardCharsets.UTF_8), bin, shard)
                    case ext => sys.error(s"unexpected member extension '$ext' in $pathStr")
                  }
                }
              }
            }
            override def hasNext: Boolean = { advance(); nextRow != null }
            override def next(): (Long, String, Array[Byte], Long) = {
              advance()
              val r = nextRow; nextRow = null; r
            }
          }
        }
      }.toDF("doc_id", "text", "bin", "shard")
  }
}
