package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Rank fusion for hybrid retrieval — combining a LEXICAL ranking (BM25)
  * with a VECTOR ranking (embedding cosine) is how production search
  * answers "spark join window"-style queries better than either modality
  * alone (Cormack et al.'s reciprocal-rank fusion, the standard because it
  * needs no score calibration between incomparable scales).
  *
  * Integer grid: a document at rank r contributes `1000000 div (K + r)`
  * (K=60, the RRF constant) summed over the rankings it appears in —
  * exact 64-bit arithmetic, so the fused ranking is a pure function of
  * the input rankings and the whole hybrid path is DuckDB-reproducible
  * whenever its inputs are (`search_hybrid_rrf` fuses the oracle-exact
  * integer BM25 and SQ8 paths).
  *
  * Scale shape: fusion runs over the CANDIDATE rankings (k rows each),
  * never the corpus — the expensive work lives in the upstream rankers,
  * which carry their own scale designs (pruned postings, quantized scan).
  * The union+groupBy here is a few hundred rows regardless of corpus
  * size.
  */
object Fusion {

  /** Fuse rankings by RRF. Each input must carry `idCol` and a 1-based
    * `rank` column; a document missing from a ranking contributes 0 from
    * it. Returns (idCol, rrf_int) — the top `k` by (rrf_int DESC, id).
    */
  def rrf(rankings: Seq[DataFrame], idCol: String, rankCol: String,
      k: Int, rrfK: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rrf needs at least one ranking")
    val contribs = rankings.map(r =>
      r.select(col(idCol),
        expr(s"1000000L div (${rrfK}L + $rankCol)").as("__c")))
    contribs.reduce(_ unionByName _)
      .groupBy(idCol)
      .agg(sum(col("__c")).as("rrf_int"))
      .orderBy(desc("rrf_int"), col(idCol))
      .limit(k)
  }
}
