package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** [[TextAnalysis.trainQualityLexicon]] + [[TextAnalysis.lexiconScore]] —
  * model-based quality filtering with exact-integer weights and margins.
  * The `text_quality_classifier` gate query checks the full pipeline
  * against DuckDB at sf0.01; this suite pins the hand-computable algebra.
  */
class LexiconScoreSpec extends SparkSpec {
  import spark.implicits._

  test("weights are positive-presence minus negative-presence counts") {
    val labeled = Seq(
      ("good good shiny words", 1),
      ("clean good prose", 1),
      ("bad spam words", 0)).toDF("text", "label")
    val w = TextAnalysis.trainQualityLexicon(labeled, "text", "label")
      .as[(String, Long)].collect().toMap
    // presence counts, not tf: "good" appears twice in doc 1 but counts once
    assert(w("good") == 2L)
    assert(w("words") == 0L)   // one positive, one negative
    assert(w("bad") == -1L)
    assert(w("shiny") == 1L)
  }

  test("score is the tf-weighted linear margin; unknown terms contribute 0") {
    val lex = Seq(("good", 3L), ("bad", -2L)).toDF("term", "weight")
    val docs = Seq(
      (1L, "good good bad"),        // 2*3 + 1*(-2) = 4, hits good+bad
      (2L, "novel unknown tokens"), // nothing in lexicon
      (3L, "bad bad bad")).toDF("doc_id", "text")
    val out = TextAnalysis.lexiconScore(docs, "text", "doc_id", lex)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 4L, 2L)))
    assert(out(2L) == ((2L, 0L, 0L)))
    assert(out(3L) == ((3L, -6L, 1L)))
  }

  test("trained classifier separates the labeled halves on the gate corpus") {
    val d = Fixtures.table(spark, sf(), "documents")
    val labeled = d.filter(col("doc_id") % 2 === 0)
      .withColumn("label", (length(col("source")) === 4).cast("int"))
    val lex = TextAnalysis.trainQualityLexicon(labeled, "text", "label")
    val scored = TextAnalysis.lexiconScore(d, "text", "doc_id", lex)
      .join(d.select(col("doc_id").as("doc"), col("source")), "doc")
    // every document scores, including the unlabeled odd half
    assert(scored.count() == d.count())
    // on the TRAINING half the fitted weights must tilt the class means
    // (the synthetic corpus shares one vocabulary, so this is the
    // train-accuracy-beats-chance pin, not a generalization claim)
    val Array(posAvg, negAvg) = scored
      .filter(col("doc") % 2 === 0)
      .groupBy((length(col("source")) === 4).as("pos"))
      .agg(avg(col("score")).as("m"))
      .orderBy(desc("pos")).as[(Boolean, Double)].collect().map(_._2)
    assert(posAvg > negAvg)
  }
}
