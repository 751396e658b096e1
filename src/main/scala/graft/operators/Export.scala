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
}
