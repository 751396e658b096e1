package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** [[Dedup.stripDuplicateSpans]] — exact substring-level dedup: every
  * later occurrence of a duplicated word n-gram span is removed, exactly
  * one copy (the corpus-order first) survives. The `dedup_substring_spans`
  * gate query checks the full output against DuckDB at sf0.01; this suite
  * pins the hand-checkable semantics on planted corpora.
  */
class SubstringDedupSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, String)], n: Int) =
    Dedup.stripDuplicateSpans(rows.toDF("doc_id", "text"), "text", "doc_id", n)
      .select($"doc", $"tokens_total", $"tokens_removed", $"clean_text")
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap

  test("cross-doc duplicated span: first occurrence kept, later stripped") {
    val boiler = "one two three four five six"
    val out = run(Seq(
      1L -> s"alpha beta $boiler gamma",
      2L -> s"delta epsilon zeta $boiler eta",
      3L -> "unrelated words entirely here now"), n = 6)
    // doc 1 is first in (doc, pos) order: nothing removed
    assert(out(1L) == ((1L, 9L, 0L, s"alpha beta $boiler gamma")))
    // doc 2 loses exactly the 6-token boilerplate, order preserved
    assert(out(2L) == ((2L, 10L, 6L, "delta epsilon zeta eta")))
    assert(out(3L)._3 == 0L)
  }

  test("intra-document repeat: second occurrence inside the same doc removed") {
    val out = run(Seq(
      1L -> "a b c d e f x a b c d e f"), n = 6)
    // positions 8..13 repeat positions 1..6
    assert(out(1L) == ((1L, 13L, 6L, "a b c d e f x")))
  }

  test("duplicated run longer than n is removed wholesale") {
    val run8 = "p q r s t u v w" // 8 tokens, n=6 -> 3 overlapping grams
    val out = run(Seq(
      1L -> s"$run8 tail",
      2L -> s"head $run8"), n = 6)
    assert(out(1L)._3 == 0L)
    assert(out(2L) == ((2L, 9L, 8L, "head")))
  }

  test("documents shorter than n words are never touched") {
    val out = run(Seq(
      1L -> "same five words here now",
      2L -> "same five words here now"), n = 6)
    assert(out(1L) == ((1L, 5L, 0L, "same five words here now")))
    assert(out(2L) == ((2L, 5L, 0L, "same five words here now")))
  }

  test("whitespace is normalized before span matching") {
    val out = run(Seq(
      1L -> "one two three four five six",
      2L -> "  one  two   three four\tfive six  "), n = 6)
    assert(out(2L) == ((2L, 6L, 6L, "")))
  }

  test("token conservation at corpus scale (sf0.001 documents)") {
    val docs = Fixtures.table(spark, sf(), "documents")
      .withColumn("text",
        when(col("doc_id") % 4 === 0,
          concat(col("text"), lit(" graft boiler plate sentence repeated across many documents verbatim today")))
          .otherwise(col("text")))
    val out = Dedup.stripDuplicateSpans(docs, "text", "doc_id", n = 6)
    assert(out.count() == docs.count())
    // every row: clean token count == tokens_total - tokens_removed
    val broken = out.filter(
      when(col("clean_text") === "", 0)
        .otherwise(size(split(trim(col("clean_text")), " "))) =!=
        col("tokens_total") - col("tokens_removed")).count()
    assert(broken == 0L)
    // the injection actually fires: later %4 docs lose >= the 10-token span
    val injectedLater = out.filter(col("doc") % 4 === 0 && col("doc") > 0)
    assert(injectedLater.filter(col("tokens_removed") >= 10).count() ==
      injectedLater.count())
  }
}
