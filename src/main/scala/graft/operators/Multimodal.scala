package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video payloads travel as opaque
  * `binary` columns next to typed metadata, and per-batch decode /
  * feature-extraction runs as partition-local iterator transforms.
  *
  * The decode step itself is a STUB — this container has no image/audio
  * codecs — implemented as a deterministic fake so the Spark-side plumbing
  * (schema, batching, partitioning, feature shapes) is real and testable.
  * A production deployment swaps [[decodeStub]] for a real codec without
  * touching anything else.
  */
object Multimodal {

  /** One media row: payload + typed metadata. */
  final case class MediaRow(
      media_id: Long,
      payload: Array[Byte],
      format: String,
      width: Int,
      height: Int)

  final case class MediaFeatures(
      media_id: Long,
      format: String,
      n_bytes: Long,
      feature: Array[Float])

  val FeatureDim = 16

  /** STUB decoder: a real implementation would decode the payload with an
    * image/audio library and run feature extraction. This deterministic fake
    * derives a fixed-size feature vector from payload bytes so tests can
    * assert shape, determinism and partition behavior.
    */
  def decodeStub(payload: Array[Byte]): Array[Float] = {
    val out = new Array[Float](FeatureDim)
    var i = 0
    while (i < payload.length) {
      out(i % FeatureDim) += (payload(i) & 0xFF) / 255.0f
      i += 1
    }
    out
  }

  /** Batch feature extraction: partition-local iterator transform (the Scala
    * analogue of `mapInPandas` batches) — no shuffle, codecs initialized
    * once per partition, rows streamed through.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // Per-partition init seam: a real codec would be constructed here,
      // once, and reused for every row in the partition.
      rows.map { r =>
        MediaFeatures(r.media_id, r.format, r.payload.length.toLong, decodeStub(r.payload))
      }
    }
  }

  /** One (media, slot) feature row: integer byte-sum per slot. */
  final case class MediaSlotFeature(
      media_id: Long,
      n_bytes: Long,
      slot: Int,
      byte_sum: Long)

  /** Integer byte-slot features: slot j accumulates the unsigned byte values
    * at payload positions ≡ j (mod `slots`). Same partition-local iterator
    * shape as [[extractFeatures]], but integer arithmetic end-to-end, so the
    * result is exactly reproducible by the DuckDB oracle (float accumulation
    * order is not). Only slots that receive at least one byte emit a row —
    * matching a relational GROUP BY over byte positions.
    */
  def byteSlotFeatures(media: Dataset[MediaRow], slots: Int = FeatureDim): Dataset[MediaSlotFeature] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val len = r.payload.length
      val n = math.min(slots, len)
      if (n == 0) Iterator.empty
      else {
        val sums = new Array[Long](n)
        var i = 0
        while (i < len) {
          sums(i % slots) += (r.payload(i) & 0xFF).toLong
          i += 1
        }
        (0 until n).iterator.map(j => MediaSlotFeature(r.media_id, len.toLong, j, sums(j)))
      }
    }
  }

  /** STUB resize: deterministic byte subsampling to a target payload size
    * with metadata updated accordingly — stands in for an image resample.
    * A real implementation decodes, resizes, re-encodes at this seam.
    */
  def resizeStub(media: Dataset[MediaRow], targetBytes: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val len = r.payload.length
        val out =
          if (len <= targetBytes) r.payload
          else Array.tabulate(targetBytes)(i => r.payload((i.toLong * len / targetBytes).toInt))
        r.copy(payload = out, width = out.length, format = r.format + ";resized")
      }
    }
  }

  /** Deterministic frame sampling for "video" payloads: pick `n` evenly
    * spaced byte-windows as stand-in frames. Real decoders plug in at the
    * same seam.
    */
  def sampleFrames(media: Dataset[MediaRow], n: Int, frameBytes: Int = 32): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val len = r.payload.length
      if (len == 0) Iterator.empty
      else (0 until n).iterator.map { i =>
        val start = (len.toLong * i / n).toInt
        val end = math.min(start + frameBytes, len)
        (r.media_id, i, r.payload.slice(start, end))
      }
    }.toDF("media_id", "frame_nr", "frame")
  }

  /** Perceptual hash (dHash-shaped) of a payload: the byte signal
    * downsamples to 33 evenly-spaced window means (the stand-in for an
    * 8×8+1 downscaled grayscale image) and bit w of the 32-bit hash is set
    * when window w's mean < window w+1's — gradient direction, the dHash
    * construction. Integer arithmetic end-to-end: window sums compare
    * CROSS-MULTIPLIED (`sum_w · cnt_{w+1} < sum_{w+1} · cnt_w`), so there
    * is no division rounding and the DuckDB oracle reproduces every bit.
    * A real deployment swaps the byte windows for decoded pixels at the
    * same seam; the hash/bucket/verify plumbing downstream is unchanged.
    */
  def perceptualHash(payload: Array[Byte], bits: Int = 32): Long = {
    val n = bits + 1
    val len = payload.length
    val sums = new Array[Long](n)
    val cnts = new Array[Long](n)
    var i = 0
    while (i < len) {
      val w = (i.toLong * n / len).toInt
      sums(w) += (payload(i) & 0xFF).toLong
      cnts(w) += 1
      i += 1
    }
    var h = 0L
    var w = 0
    while (w < bits) {
      if (cnts(w) > 0 && cnts(w + 1) > 0 &&
          sums(w) * cnts(w + 1) < sums(w + 1) * cnts(w)) h |= (1L << w)
      w += 1
    }
    h
  }

  /** Whether the payload populates at least one ADJACENT window pair —
    * the effective domain of the hash. A payload below ~bits/2 bytes
    * lands its bytes in non-adjacent windows, every gradient comparison
    * is undefined, and the hash degenerates to 0; such payloads must be
    * DROPPED (not hashed to 0 and allowed to pair at hamming 0), which is
    * also exactly the domain the SQL oracle's adjacent-window join keeps.
    */
  def phashDefined(payload: Array[Byte], bits: Int = 32): Boolean = {
    val n = bits + 1
    val len = payload.length
    if (len == 0) return false
    val cnts = new Array[Long](n)
    var i = 0
    while (i < len) { cnts((i.toLong * n / len).toInt) += 1; i += 1 }
    var w = 0
    while (w < bits) {
      if (cnts(w) > 0 && cnts(w + 1) > 0) return true
      w += 1
    }
    false
  }

  /** Near-duplicate media pairs by perceptual hash: hamming(phash) ≤
    * `maxHamming`. Candidates come from 4 × 8-bit chunk buckets — by
    * pigeonhole, two hashes within hamming 3 share at least one unchanged
    * chunk, so the bucketing is COMPLETE (the engine finds exactly the
    * all-pairs answer, which is how the gate gets a DuckDB oracle) while
    * candidate cost stays Σ bucket², never |media|². The same
    * explode-by-chunk / shuffle-by-(chunk,value) layout as SimHash text
    * dedup — 100 TB-shaped.
    */
  def phashNearDups(media: Dataset[MediaRow], maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3,
      s"4x8-bit bucketing is complete only to hamming 3, got $maxHamming")
    import media.sparkSession.implicits._
    val hashes = media.mapPartitions(rows =>
        rows.filter(r => phashDefined(r.payload))
          .map(r => (r.media_id, perceptualHash(r.payload))))
      .toDF("media_id", "phash")
    val chunks = hashes.select(col("media_id"), col("phash"),
      explode(array((0 until 4).map(c =>
        struct(lit(c).as("c"),
          shiftright(col("phash"), 8 * c).bitwiseAND(lit(255L)).as("v"))): _*))
        .as("ch"))
      .select(col("media_id"), col("phash"), col("ch.c"), col("ch.v"))
    val a = chunks.as("a")
    val b = chunks.as("b")
    a.join(b, col("a.c") === col("b.c") && col("a.v") === col("b.v") &&
        col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("id_a"), col("b.media_id").as("id_b"),
        bit_count(col("a.phash").bitwiseXOR(col("b.phash"))).cast("long")
          .as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Build a media table from the documents fixture: the text bytes stand in
    * for an encoded payload; metadata is derived. Real pipelines read the
    * binary column straight from parquet.
    */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      col("text").cast("binary").as("payload"),
      lit("fake/raw").as("format"),
      length(col("text")).as("width"),
      lit(1).as("height"))
}
