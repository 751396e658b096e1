package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** The composed dedup pipeline ([[Dedup.pipelineDedup]]): stages compose
  * in order (exact before near-dup), the planted copies fall to the right
  * stage, and the composition is idempotent — a second run over the
  * survivors drops nothing.
  */
class PipelineDedupSpec extends SparkSpec {
  import spark.implicits._

  private def corpus: DataFrame = Fixtures.pipelineDedupCorpus(spark, sf())

  private def run(c: DataFrame): DataFrame =
    Dedup.pipelineDedup(c, "text", "doc_id",
      c.select(col("doc_id"), length(col("text")).as("q")), "q")

  test("planted copies fall to their stages; survivors are the composition") {
    val out = run(corpus).select("doc_id").as[Long].collect().toSet
    // every byte-exact +200000 copy dies in the exact stage
    assert(out.forall(_ < 200000), s"exact copies leaked: ${out.filter(_ >= 200000)}")
    // a planted (original, replay) pair never BOTH survive, and the
    // survivor of the pair is the longer replay — except where a replay
    // sits in a LARGER cross-doc component and an even longer member won
    // (the corpus has organic near-dups; allow a small tail)
    val originals = (0L until 500L by 10).toSet
    assert(originals.forall(d => !(out(d) && out(d + 100000))),
      "both members of a planted near-dup pair survived")
    assert(originals.forall(d => !out(d)),
      "an original with a longer replay survived the keep-best stage")
    val replaysKept = originals.count(d => out(d + 100000))
    assert(replaysKept >= 45, s"only $replaysKept/50 replays survived")
    // composition equals the manually chained stages
    val kept1 = Dedup.keepFirst(corpus, Seq("text"), Seq(col("doc_id")))
    val manual = Dedup.keepBest(kept1,
        Dedup.ngramJaccardPairs(kept1, "text", "doc_id", 3, 0.5),
        kept1.select(col("doc_id"), length(col("text")).as("q")), "doc_id", "q")
      .select("doc_id").as[Long].collect().toSet
    assert(out == manual)
  }

  test("over-cap component set plans a shuffle join, same survivors") {
    // Plant an over-cap duplicate set: broadcastIdCap=0 makes EVERY
    // component table "too big to broadcast", and killing the planner's
    // own threshold proves keepBest degrades to a shuffle join instead of
    // forcing a driver-sized build — the 100 TB crawl shape, where the
    // duplicate set is billions of ids and an unconditional broadcast
    // hint would OOM the driver.
    val savedAuto = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.graft.dedup.broadcastIdCap", "0")
    try {
      val c = corpus
      val pairs = Dedup.ngramJaccardPairs(c, "text", "doc_id", 3, 0.5)
      val scores = c.select(col("doc_id"), length(col("text")).as("q"))
      val out = Dedup.keepBest(c, pairs, scores, "doc_id", "q")
      val plan = out.queryExecution.sparkPlan.toString
      assert(!plan.contains("BroadcastHashJoin") && !plan.contains("BroadcastExchange"),
        plan)
      val got = out.select("doc_id").as[Long].collect().toSet
      // fall-open path is plan-only: survivors identical to the hinted path
      spark.conf.unset("spark.graft.dedup.broadcastIdCap")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", savedAuto)
      val hintedOut = Dedup.keepBest(c, pairs, scores, "doc_id", "q")
        .select("doc_id").as[Long].collect().toSet
      assert(got == hintedOut)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", savedAuto)
      spark.conf.unset("spark.graft.dedup.broadcastIdCap")
    }
  }

  test("idempotent: re-running the pipeline over its survivors drops nothing") {
    val once = run(corpus)
    val twice = run(once).select("doc_id").as[Long].collect().toSet
    assert(twice == once.select("doc_id").as[Long].collect().toSet)
  }
}
