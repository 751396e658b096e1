package graft.operators

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.lake.LakeDataset
import graft.model.StorageSpec

/** Incremental MinHash-LSH near-duplicate index.
  *
  * [[Dedup.minhashDedup]] recomputes shingles + signatures for the WHOLE
  * corpus on every run — at 100 TB that is the difference between a nightly
  * job and an impossibility. This index persists the two derived tables as
  * lake datasets under one root:
  *
  *   - `root/shingles`: (doc, h)            — 8-byte shingle hashes
  *   - `root/bands`:    (doc, sz, band, bh) — banded signatures + set size
  *
  * both PARTITIONED BY an ingest batch number, so each [[addBatch]]:
  *
  *   1. shingles + signs ONLY the new documents (cost ∝ batch);
  *   2. band-joins new-vs-all with the small new side BROADCAST — the
  *      corpus-side band table streams through the join with no shuffle
  *      and no re-signing;
  *   3. Jaccard-verifies candidates against the persisted shingle table
  *      (again broadcast-filtered to candidate docs only);
  *   4. appends the batch's rows as a NEW partition directory — the
  *      incremental save writes one `batch=N` directory per table, never
  *      rewriting prior batches.
  *
  * Returned pairs are exactly the [[Dedup.minhashDedup]] pairs that involve
  * at least one new document (same hashes, same banding, same verify —
  * IncrementalDedupSpec asserts set equality with the full recompute).
  *
  * Contract: `doc` ids must be globally unique across batches (re-ingesting
  * an id would double its shingle rows) and (numHashes, bands, shingleSize)
  * must match across sessions — they parameterize the persisted hashes.
  */
final class MinhashIndex private (
    spark: SparkSession, root: String,
    val numHashes: Int, val bands: Int, val shingleSize: Int,
    private var shingleDs: Option[LakeDataset],
    private var bandDs: Option[LakeDataset],
    private var nextBatch: Long) {
  require(numHashes % bands == 0, "numHashes must divide into bands")
  private val r = numHashes / bands

  /** Number of batches ingested so far. */
  def batches: Long = nextBatch

  /** All persisted (doc, h) shingle rows. */
  def shingleRows: Option[DataFrame] = shingleDs.map(_.toDF.select("doc", "h"))

  /** All persisted (doc, sz, band, bh) band rows. */
  def bandRows: Option[DataFrame] =
    bandDs.map(_.toDF.select("doc", "sz", "band", "bh"))

  /** Ingest one batch of documents; returns the verified near-dup pairs
    * (doc_a, doc_b, jaccard) involving at least one batch document. The
    * result is materialized before this method returns (it must survive the
    * index mutating on later batches).
    */
  def addBatch(
      batch: DataFrame, textCol: String, idCol: String,
      threshold: Double = 0.7): DataFrame = this.synchronized {
    require(threshold > 0.0, "threshold must be positive")
    val expl = Dedup.shingleRows(batch, textCol, idCol, shingleSize)
      .select(col("doc"), xxhash64(col("s")).as("h"))
      .cache()
    val mins = (0 until numHashes).map(i => min(xxhash64(col("h"), lit(i))).as(s"m$i"))
    val agg = expl.groupBy("doc").agg(count(lit(1)).as("sz"), mins: _*)
    val bandStructs = (0 until bands).map { b =>
      val cols = (b * r until (b + 1) * r).map(i => col(s"m$i").cast("string"))
      struct(lit(b).as("band"), xxhash64(concat_ws(",", cols: _*), lit(b)).as("bh"))
    }
    val bandedNew = agg
      .select(col("doc"), col("sz"), explode(array(bandStructs: _*)).as("b"))
      .select(col("doc"), col("sz"), col("b.band").as("band"), col("b.bh").as("bh"))
      .cache()

    val bandedAll = bandRows.map(_.unionByName(bandedNew)).getOrElse(bandedNew)
    val shinglesAll = shingleRows.map(_.unionByName(expl)).getOrElse(expl)

    // New side broadcast: the corpus band table streams through the join —
    // a scan, not a shuffle. Pair order normalizes via conditional swap so
    // new-old pairs come out (old, new) when the old id is smaller; new-new
    // pairs appear from both sides and collapse in the distinct.
    val swap = col("x.doc") > col("y.doc")
    val cands = broadcast(bandedNew).as("x")
      .join(bandedAll.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh"))
      .filter(col("x.doc") =!= col("y.doc"))
      .select(
        when(swap, col("y.doc")).otherwise(col("x.doc")).as("doc_a"),
        when(swap, col("x.doc")).otherwise(col("y.doc")).as("doc_b"),
        when(swap, col("y.sz")).otherwise(col("x.sz")).as("sz_a"),
        when(swap, col("x.sz")).otherwise(col("y.sz")).as("sz_b"))
      .distinct()
    val verified = cands
      .join(shinglesAll.select(col("doc").as("doc_a"), col("h")), "doc_a")
      .join(shinglesAll.select(col("doc").as("doc_b"), col("h")), Seq("doc_b", "h"))
      .groupBy("doc_a", "doc_b", "sz_a", "sz_b")
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("sz_a") + col("sz_b") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
      .cache()
    verified.count() // force while expl/bandedNew are still the live state

    // Append the batch as a new partition directory in each table.
    val b = nextBatch
    appendBatch(expl, "shingles", b, ds => shingleDs = Some(ds))
    appendBatch(bandedNew, "bands", b, ds => bandDs = Some(ds))
    nextBatch = b + 1
    expl.unpersist()
    bandedNew.unpersist()
    verified
  }

  private def appendBatch(
      rows: DataFrame, table: String, batchNr: Long,
      set: LakeDataset => Unit): Unit = {
    val stamped = rows.withColumn("batch", lit(batchNr))
    (if (table == "shingles") shingleDs else bandDs) match {
      case Some(ds) =>
        ds.insert(stamped)
        // Save ONLY the new batch's cell — prior directories are untouched.
        ds.partKeys
          .filter(_.partValues.contains("batch" -> batchNr.toString))
          .foreach(ds.savePart)
      case None =>
        val ds = LakeDataset.fromDataFrame(spark, stamped,
          partitionCols = Seq("batch"),
          storage = Some(StorageSpec(s"$root/$table")))
        ds.toStorage()
        set(ds)
    }
  }
}

object MinhashIndex {

  /** Open the index at `root`: load the persisted state if a prior session
    * saved one, else start empty. The hash parameters persist beside the
    * state (`params.json`) and are VALIDATED on reopen — signatures built
    * with different (numHashes, bands, shingleSize) live in a different
    * hash space, and mixing them would silently produce garbage candidates
    * rather than an error.
    */
  def open(
      spark: SparkSession, root: String,
      numHashes: Int = 32, bands: Int = 8, shingleSize: Int = 3): MinhashIndex = {
    val paramsPath = Paths.get(s"$root/params.json")
    val hasState = Files.exists(Paths.get(s"$root/bands/_manifest.json"))
    if (!hasState) {
      Files.createDirectories(Paths.get(root))
      Files.writeString(paramsPath,
        s"""{"numHashes":$numHashes,"bands":$bands,"shingleSize":$shingleSize}""")
      new MinhashIndex(spark, root, numHashes, bands, shingleSize, None, None, 0L)
    } else {
      if (Files.exists(paramsPath)) {
        val saved = Files.readString(paramsPath)
        def field(k: String): Option[Int] =
          s""""$k"\\s*:\\s*(\\d+)""".r.findFirstMatchIn(saved).map(_.group(1).toInt)
        val ok = field("numHashes").forall(_ == numHashes) &&
          field("bands").forall(_ == bands) &&
          field("shingleSize").forall(_ == shingleSize)
        require(ok, s"MinhashIndex at $root was built with $saved — " +
          s"reopening with (numHashes=$numHashes, bands=$bands, " +
          s"shingleSize=$shingleSize) would mix incompatible hash spaces")
      }
      val sh = LakeDataset.fromStorage(spark, s"$root/shingles")
      val bd = LakeDataset.fromStorage(spark, s"$root/bands")
      val next = bd.partKeys
        .flatMap(_.partValues.collect { case ("batch", v) => v.toLong })
        .maxOption.map(_ + 1).getOrElse(0L)
      new MinhashIndex(spark, root, numHashes, bands, shingleSize,
        Some(sh), Some(bd), next)
    }
  }
}
