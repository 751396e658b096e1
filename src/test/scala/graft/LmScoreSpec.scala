package graft

import graft.operators.TextAnalysis

/** [[TextAnalysis.bigramLmScore]] — CCNet-style n-gram LM quality scoring
  * on the exact-integer grid. The `text_lm_score` gate checks the full
  * corpus path against DuckDB at sf0.01; this suite pins the
  * hand-computable model algebra and the edge cases the gate data never
  * hits (short docs, full-OOV docs, conditional-rate normalization).
  */
class LmScoreSpec extends SparkSpec {
  import spark.implicits._

  private val ref = Seq(
    (1L, "the cat sat"),     // bigrams: "the cat", "cat sat"
    (2L, "the cat ran"),     // bigrams: "the cat", "cat ran"
    (3L, "the dog sat")      // bigrams: "the dog", "dog sat"
  ).toDF("doc_id", "text")

  test("conditional rates: rate(w1 w2) = count(w1 w2)*scale div count(w1 .)") {
    // Model: heads "the"(3): the cat=2, the dog=1; "cat"(2): sat=1, ran=1;
    // "dog"(1): sat=1. scale=1000 -> rates 666, 333, 500, 500, 1000.
    val raw = Seq((10L, "the cat sat")).toDF("doc_id", "text")
    val out = TextAnalysis.bigramLmScore(raw, ref, "text", "doc_id", scale = 1000L)
      .as[(Long, Long, Long, Long, Long)].collect().head
    // "the cat" rate = 2*1000 div 3 = 666; "cat sat" = 1*1000 div 2 = 500.
    assert(out == ((10L, 2L, 0L, 1166L, 583L)))
  }

  test("OOV mass: unmodeled bigrams count toward oov and add zero score") {
    val raw = Seq((20L, "the cat flew home")).toDF("doc_id", "text")
    // "the cat"=666 modeled; "cat flew" and "flew home" unseen.
    val out = TextAnalysis.bigramLmScore(raw, ref, "text", "doc_id", scale = 1000L)
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(out == ((20L, 3L, 2L, 666L, 222L)))
  }

  test("a fully-OOV doc scores zero, not null") {
    val raw = Seq((30L, "completely novel words")).toDF("doc_id", "text")
    val out = TextAnalysis.bigramLmScore(raw, ref, "text", "doc_id", scale = 1000L)
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(out == ((30L, 2L, 2L, 0L, 0L)))
  }

  test("docs with fewer than two words are absent from the output") {
    val raw = Seq((1L, "single"), (2L, ""), (3L, "  "), (4L, "two words"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.bigramLmScore(raw, ref, "text", "doc_id")
      .select("doc").as[Long].collect().toSet
    assert(out == Set(4L))
  }

  test("repeated bigrams weight by term frequency") {
    val raw = Seq((40L, "the cat the cat")).toDF("doc_id", "text")
    // bigrams: the cat (x2), cat the (OOV).
    val out = TextAnalysis.bigramLmScore(raw, ref, "text", "doc_id", scale = 1000L)
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(out == ((40L, 3L, 1L, 1332L, 444L)))
  }

  test("reference-like docs outrank reference-unlike docs") {
    val raw = Seq(
      (1L, "the cat sat the cat ran the dog sat"),
      (2L, "zz yy xx ww vv uu")).toDF("doc_id", "text")
    val out = TextAnalysis.bigramLmScore(raw, ref, "text", "doc_id")
      .select("doc", "lm_avg").as[(Long, Long)].collect().toMap
    assert(out(1L) > out(2L))
    assert(out(2L) == 0L)
  }
}
