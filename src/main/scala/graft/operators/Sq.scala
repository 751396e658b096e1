package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar 8-bit quantization (SQ8) for embedding columns — the OTHER
  * standard vector-compression scheme beside product quantization
  * ([[Pq]]): every float32 element maps to one signed byte via a
  * per-vector scale, cutting vector storage 4× (and the scan bandwidth of
  * a brute-force pass with it). At 100 TB of embeddings that is the
  * difference between scanning 25 TB and 100 TB for the same recall
  * envelope; FAISS's `SQ8` and every vector store's "int8" option are this
  * scheme.
  *
  * Design for reproducibility (what makes `ann_sq8_topk` oracle-checkable
  * where float ANN is rows-only):
  *
  *  - quantization is elementwise determinism: `code_i =
  *    floor(x_i · 127/maxabs + 0.5)` — float32 inputs cast exactly to
  *    double, one multiply, one floor; no reduction whose order an engine
  *    could pick differently (`maxabs` folds the array LEFT-TO-RIGHT via a
  *    higher-order aggregate, list order in every engine).
  *  - scoring is CODE-SPACE cosine: an exact integer dot product and two
  *    exact integer norms (≤ 127²·dim per pair — far inside double's 2^53
  *    exact range), divided once and rounded to the same 1e-6 grid as
  *    [[Similarity.exactTopKQuantized]]. The only floating steps are two
  *    sqrt's and one division of exact integers — bit-identical IEEE ops
  *    everywhere.
  *
  * The top-k is approximate relative to FLOAT cosine (that is the point of
  * quantizing — SqSpec pins recall against the exact top-k), but the
  * answer itself is a deterministic pure function of the data, so DuckDB
  * reproduces it bit-for-bit.
  */
object Sq {

  /** Per-vector max |x_i|, folded in list order (deterministic). */
  private def maxAbs(vec: Column): Column =
    aggregate(vec, lit(0.0),
      (acc, x) => greatest(acc, abs(x.cast("double"))))

  /** Encode: (id, codes array<int> in [-127,127]). A zero vector encodes
    * to all-zero codes (scale 0 — the same guard the oracle SQL applies).
    * Codes fit a byte; they stay int-typed here because the scoring math
    * reads them straight back into integer arithmetic — a storage sink
    * would cast to tinyint/byte for the 4× on disk.
    */
  def sq8Encode(df: DataFrame, vecCol: String, idCol: String,
      keepCols: Seq[String] = Nil): DataFrame =
    df.select(col(idCol) +: keepCols.map(col) :+ col(vecCol) :+
        maxAbs(col(vecCol)).as("__maxabs"): _*)
      .select(col(idCol) +: keepCols.map(col) :+
        transform(col(vecCol), x =>
          floor(x.cast("double") *
            when(col("__maxabs") === 0.0, lit(0.0))
              .otherwise(lit(127.0) / col("__maxabs")) + lit(0.5))
            .cast("int")).as("codes"): _*)

  /** Quantize one query vector driver-side — the same arithmetic as
    * [[sq8Encode]], in doubles, so a query drawn from the corpus gets the
    * exact codes its stored row has.
    */
  def sq8Codes(query: Seq[Float]): Seq[Int] = {
    val ma = query.foldLeft(0.0)((acc, x) => math.max(acc, math.abs(x.toDouble)))
    val scale = if (ma == 0.0) 0.0 else 127.0 / ma
    query.map(x => math.floor(x.toDouble * scale + 0.5).toInt)
  }

  /** Code-space cosine of a codes column against fixed query codes, on the
    * 1e-6 grid: `round(dot / (sqrt(|v|²)·sqrt(|q|²)) · 1e6)` with dot and
    * norms exact integers. Zero-norm rows score 0 (same as [[Similarity]]).
    *
    * Dimension guard: `zip_with` pads a length mismatch with nulls, which
    * would silently null the dot product and return an empty/short top-k;
    * instead a stored row whose dimensionality differs from the query
    * raises (via `raise_error`) so the mismatch fails LOUDLY at scan time.
    */
  def cosQ(codes: Column, qCodes: Seq[Int]): Column = {
    val q = array(qCodes.map(lit): _*)
    val checked = when(size(codes) === qCodes.length, codes)
      .otherwise(raise_error(concat(
        lit(s"SQ8 dimension mismatch: query has ${qCodes.length} dims, stored codes have "),
        size(codes).cast("string"))))
    val dot = aggregate(zip_with(checked, q, (a, b) => (a * b).cast("long")),
      lit(0L), (acc, x) => acc + x)
    val nv = aggregate(codes, lit(0L), (acc, x) => acc + (x * x).cast("long"))
    val nq = lit(qCodes.map(c => c.toLong * c).sum)
    when(nv === 0L || nq === 0L, lit(0L))
      .otherwise(round(dot.cast("double") /
        (sqrt(nv.cast("double")) * sqrt(nq.cast("double"))) * 1000000.0)
        .cast("long"))
  }

  /** Top-k by quantized code-space cosine over an encoded corpus — a
    * narrow scan of the 4×-smaller codes + TakeOrdered, no shuffle.
    * `pred` is a metadata PRE-filter (a [[sq8Encode]] `keepCols` column):
    * it lands before scoring — on the parquet scan as a pushed filter when
    * the encoded corpus is stored — never on the ranked result, where a
    * post-filter could return fewer than k survivors.
    */
  def sq8TopK(encoded: DataFrame, idCol: String,
      query: Seq[Float], k: Int, pred: Option[Column] = None): DataFrame =
    pred.map(encoded.filter).getOrElse(encoded)
      .select(col(idCol), cosQ(col("codes"), sq8Codes(query)).as("cos_q"))
      .orderBy(desc("cos_q"), col(idCol))
      .limit(k)
}
