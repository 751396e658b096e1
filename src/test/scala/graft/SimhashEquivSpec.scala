package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Equivalence evidence for the SimHash dedup surface — the one dedup
  * variant whose output is hash-valued end-to-end (no SQL oracle can
  * reproduce xxhash64 bit patterns). SimHash is a random-hyperplane sketch
  * of the word-tf vector, so the EXACT ground truth is
  * [[Dedup.wordCosinePairs]] (integer tf arithmetic, oracle-reproducible —
  * the `dedup_simhash_cosine` gate query). The corpus here is 10-100-word
  * docs over a 31-word vocabulary, the hardest regime for a 64-bit sketch
  * (per-bit noise σ ≈ 3 bits), so the pins bracket the sketch from both
  * sides with calibrated margins instead of asserting set equality:
  * a tight hamming cut only ever fires on truly-similar pairs, and
  * truly-near-identical pairs never escape the default cut.
  */
class SimhashEquivSpec extends SparkSpec {
  import spark.implicits._

  private lazy val corpus = Fixtures.nearDupDocuments(spark, sf())

  /** Exact tf-cosine for EVERY pair (threshold 0 keeps all) — ~150k pairs
    * at sf0.001, collected once and shared by the pins below.
    */
  private lazy val cosOf: Map[(Long, Long), Double] =
    Dedup.wordCosinePairs(corpus, "text", "doc_id", threshold = 0.0)
      .select(col("doc_a"), col("doc_b"), col("cosine"))
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, c) => (a, b) -> c }.toMap

  private def simPairs(maxHamming: Int): Set[(Long, Long)] =
    Dedup.simhashDedup(corpus, "text", "doc_id", maxHamming = maxHamming)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet

  test("precision: hamming<=2 pairs all have exact tf-cosine >= 0.95") {
    val sim = simPairs(2)
    assert(sim.nonEmpty)
    val bad = sim.filter(p => cosOf.getOrElse(p, 0.0) < 0.95)
    assert(bad.isEmpty,
      s"hamming<=2 paired dissimilar docs: ${bad.map(p => p -> cosOf.get(p))}")
  }

  test("precision floor: default hamming<=6 never pairs unrelated docs") {
    // measured floor 0.61 on this corpus; 0.5 leaves noise margin while
    // still refuting any gross disagreement (unrelated pairs sit ~0.3)
    val bad = simPairs(6).filter(p => cosOf.getOrElse(p, 0.0) < 0.5)
    assert(bad.isEmpty,
      s"hamming<=6 paired unrelated docs: ${bad.map(p => p -> cosOf.get(p))}")
  }

  test("recall: near-identical pairs (cosine >= 0.995) all found at hamming<=6") {
    val sim = simPairs(6)
    val nearIdentical = cosOf.filter(_._2 >= 0.995).keySet
    assert(nearIdentical.size >= 15, s"corpus lost its planted near-dups: ${nearIdentical.size}")
    val missed = nearIdentical -- sim
    assert(missed.isEmpty, s"sketch missed near-identical pairs: $missed")
    // one notch looser: cosine >= 0.99 may lose a pair to sketch noise,
    // but never more than a couple
    val hi = cosOf.filter(_._2 >= 0.99).keySet
    assert((hi -- sim).size <= 2,
      s"sketch missed ${(hi -- sim).size} of ${hi.size} pairs at cosine>=0.99")
  }
}
