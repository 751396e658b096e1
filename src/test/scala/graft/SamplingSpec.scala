package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Sampling, TextAnalysis}

/** Deterministic sampling/curation operators: partitioning-independence (the
  * property Spark's own `sample` lacks), rank-pushdown plan shape, and
  * hand-computed ground truths for the repetition/normalization signals.
  */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Fixtures.table(spark, sf(), "documents")

  test("hashSample is deterministic and partitioning-independent") {
    val a = Sampling.hashSample(docs, "doc_id", "1999")
      .select("doc_id").as[Long].collect().toSet
    val b = Sampling.hashSample(docs.repartition(7), "doc_id", "1999")
      .select("doc_id").as[Long].collect().toSet
    val c = Sampling.hashSample(docs, "doc_id", "1999")
      .select("doc_id").as[Long].collect().toSet
    assert(a == b, "sample must not depend on partitioning")
    assert(a == c, "sample must be rerun-stable")
    val n = docs.count().toDouble
    // 0x1999/0x10000 ≈ 10%; 16 bits of hash on 500 ids — allow wide slack.
    assert(a.size > n * 0.04 && a.size < n * 0.2, s"${a.size} of $n kept")
    // Membership is stable under corpus growth: sampling a SUBSET keeps
    // exactly the intersection (holdout sets survive dataset versions).
    val sub = Sampling.hashSample(docs.filter(col("doc_id") < 100), "doc_id", "1999")
      .select("doc_id").as[Long].collect().toSet
    assert(sub == a.filter(_ < 100))
  }

  test("budgetSelect equals the global-window truth, independent of input partitioning") {
    val scored = docs.withColumn("score", (col("doc_id") * 37) % 1000)
    def truthAt(budget: Long): Set[Long] = {
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("score").desc, col("doc_id").asc)
      scored.withColumn("cum", sum(col("n_chars")).over(w))
        .filter(col("cum") <= budget)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    }
    for (budget <- Seq(0L, 30000L, 10000000L)) {
      val got = Sampling.budgetSelect(scored, col("score"), col("doc_id"),
        "n_chars", budget, nPartitions = 7)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(got == truthAt(budget), s"budget=$budget")
      // Same result from a perversely re-partitioned input.
      val got2 = Sampling.budgetSelect(scored.repartition(13, col("n_chars")),
        col("score"), col("doc_id"), "n_chars", budget, nPartitions = 3)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(got2 == got, s"partitioning changed the selection at budget=$budget")
    }
    // Exactly everything when the budget is total chars.
    val total = docs.agg(sum("n_chars")).head().getLong(0)
    assert(Sampling.budgetSelect(scored, col("score"), col("doc_id"),
      "n_chars", total, nPartitions = 5).count() == docs.count())
    // Float costs are refused (an inexact prefix sum is order-dependent).
    intercept[IllegalArgumentException] {
      Sampling.budgetSelect(scored.withColumn("c", col("n_chars").cast("double")),
        col("score"), col("doc_id"), "c", 1000L)
    }
    // NULL and negative costs are refused loudly (a NULL has no prefix-sum
    // semantics; a negative breaks the window-filter equivalence).
    val eNull = intercept[IllegalArgumentException] {
      Sampling.budgetSelect(
        scored.withColumn("c",
          when(col("doc_id") === 7, lit(null)).otherwise(col("n_chars"))),
        col("score"), col("doc_id"), "c", 100000L)
    }
    assert(eNull.getMessage.contains("NULL"))
    val eNeg = intercept[IllegalArgumentException] {
      Sampling.budgetSelect(
        scored.withColumn("c",
          when(col("doc_id") === 7, lit(-5L)).otherwise(col("n_chars"))),
        col("score"), col("doc_id"), "c", 100000L)
    }
    assert(eNeg.getMessage.contains("negative"))
  }

  test("stratifiedSample applies per-stratum rates") {
    val kept = Sampling.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> "7fff"), default = "1999")
    // Every kept row individually satisfies its stratum's threshold…
    val viol = kept.filter(
      Sampling.hashKey(col("doc_id")) >
        when(col("lang") === "en", lit("7fff")).otherwise(lit("1999"))).count()
    assert(viol == 0)
    // …and nothing satisfying it was dropped.
    val total = docs.filter(
      Sampling.hashKey(col("doc_id")) <=
        when(col("lang") === "en", lit("7fff")).otherwise(lit("1999"))).count()
    assert(kept.count() == total)
    // en keeps a visibly larger fraction than the rest.
    val enRate = kept.filter($"lang" === "en").count().toDouble /
      docs.filter($"lang" === "en").count()
    val restRate = kept.filter($"lang" =!= "en").count().toDouble /
      docs.filter($"lang" =!= "en").count()
    assert(enRate > restRate * 2, s"en=$enRate rest=$restRate")
  }

  test("topKPerGroup matches the sort-based reference and rides WindowGroupLimit") {
    val got = Sampling.topKPerGroup(docs, Seq("lang"),
        Seq(col("n_chars").desc, col("doc_id").asc), k = 3)
      .select("lang", "doc_id").as[(String, Long)].collect().toSet
    val want = docs.select("lang", "doc_id", "n_chars")
      .as[(String, Long, Long)].collect()
      .groupBy(_._1).toSeq.flatMap { case (_, rows) =>
        rows.sortBy(r => (-r._3, r._2)).take(3).map(r => (r._1, r._2)).toSeq
      }.toSet
    assert(got == want)
    // The rank filter must push the k-bound into the shuffle: each map task
    // ships its local top-k, not the whole group (the 100 TB property).
    val plan = Sampling.topKPerGroup(docs, Seq("lang"),
      Seq(col("n_chars").desc, col("doc_id").asc), k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"no WindowGroupLimit in:\n$plan")
  }

  test("mixtureWeights: shares sum to 1, uniform target, weight = target/share") {
    val w = Sampling.mixtureWeights(docs, "source",
      TextAnalysis.tokenCount(col("text"))).cache()
    val n = w.count()
    assert(math.abs(w.agg(sum("share")).head().getDouble(0) - 1.0) < 1e-12)
    val r = w.head()
    assert(math.abs(r.getAs[Double]("target_share") - 1.0 / n) < 1e-15)
    val bad = w.filter(
      abs(col("sample_weight") - col("target_share") / col("share")) > 1e-12).count()
    assert(bad == 0)
    w.unpersist()
  }

  test("lineRepetition computes hand-checked fractions") {
    val df = Seq(
      (1L, "aa\nbb\ncc"),          // no repeats
      (2L, "aa\naa\nbb"),          // 2/3 lines are the repeated pair
      (3L, "x\n\nx\nlonger line")  // empty line ignored; 'x' repeated
    ).toDF("doc_id", "text")
    val m = TextAnalysis.lineRepetition(df, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(m(1L) == ((0.0, 0.0)))
    // doc 2: 3 lines, 2 distinct -> dup_line_frac = 1 - 2/3; dup chars 2+2 of 6.
    assert(math.abs(m(2L)._1 - (1.0 - 2.0 / 3)) < 1e-15)
    assert(math.abs(m(2L)._2 - 4.0 / 6) < 1e-15)
    // doc 3: lines x, x, 'longer line' (11 chars): dup chars 2 of 13.
    assert(math.abs(m(3L)._1 - (1.0 - 2.0 / 3)) < 1e-15)
    assert(math.abs(m(3L)._2 - 2.0 / 13) < 1e-15)
  }

  test("topBigramFrac computes hand-checked concentration") {
    val df = Seq(
      (1L, "x y x y x"),   // bigrams: xy yx xy yx -> top 2/4
      (2L, "a b c d"),     // all distinct -> 1/3
      (3L, "solo")         // no bigrams -> dropped
    ).toDF("doc_id", "text")
    val m = TextAnalysis.topBigramFrac(df, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(m.keySet == Set(1L, 2L))
    assert(m(1L) == ((0.5, 4L)))
    assert(m(2L) == ((1.0 / 3, 3L)))
  }

  test("leakproofSplit: no near-dup cluster straddles the split; loners match hashSample") {
    val corpus = Fixtures.nearDupDocuments(spark, sf())
    val pairs = Dedup.ngramJaccardPairs(corpus, "text", "doc_id",
      shingleSize = 3, threshold = 0.5)
    val split = Sampling.leakproofSplit(corpus, pairs, "doc_id", "3fff")
    val byId = split.select("doc_id", "split").as[(Long, String)]
      .collect().toMap
    // The leak-proofing invariant: both ends of every near-dup pair land
    // in the SAME split.
    val ps = pairs.select("doc_a", "doc_b").as[(Long, Long)].collect()
    assert(ps.nonEmpty, "fixture must plant near-dup pairs")
    ps.foreach { case (a, b) =>
      assert(byId(a) == byId(b), s"pair ($a,$b) straddles the split")
    }
    // Docs in no pair split exactly as a raw hashSample of their own id.
    val paired = ps.flatMap(p => Seq(p._1, p._2)).toSet
    val rawVal = Sampling.hashSample(corpus, "doc_id", "3fff")
      .select("doc_id").as[Long].collect().toSet
    byId.keySet.filterNot(paired).foreach { id =>
      assert((byId(id) == "val") == rawVal(id), s"loner $id split drifted")
    }
    // Both splits populated, determinism under repartitioning.
    assert(byId.values.toSet == Set("train", "val"))
    val again = Sampling.leakproofSplit(corpus.repartition(7), pairs,
      "doc_id", "3fff").select("doc_id", "split").as[(Long, String)]
      .collect().toMap
    assert(again == byId)
  }

  test("leakproofFolds: clusters share a fold, loners match the Lehmer model, all folds populated") {
    val corpus = Fixtures.nearDupDocuments(spark, sf())
    val pairs = Dedup.ngramJaccardPairs(corpus, "text", "doc_id",
      shingleSize = 3, threshold = 0.5)
    val k = 5
    val folds = Sampling.leakproofFolds(corpus, pairs, "doc_id", k)
    val byId = folds.select("doc_id", "fold").as[(Long, Int)].collect().toMap
    val ps = pairs.select("doc_a", "doc_b").as[(Long, Long)].collect()
    assert(ps.nonEmpty)
    ps.foreach { case (a, b) =>
      assert(byId(a) == byId(b), s"pair ($a,$b) straddles folds")
    }
    // Loners fold by the documented Lehmer arithmetic of their own id.
    val paired = ps.flatMap(p => Seq(p._1, p._2)).toSet
    byId.keySet.filterNot(paired).foreach { id =>
      val expect = ((id % 2147483647L) * 48271L % 2147483647L % k).toInt
      assert(byId(id) == expect, s"loner $id fold drifted")
    }
    assert(byId.values.toSet == (0 until k).toSet, "every fold populated")
    assert(byId.values.forall(f => f >= 0 && f < k))
    // Determinism under repartitioning.
    val again = Sampling.leakproofFolds(corpus.repartition(7), pairs, "doc_id", k)
      .select("doc_id", "fold").as[(Long, Int)].collect().toMap
    assert(again == byId)
    intercept[IllegalArgumentException] {
      Sampling.leakproofFolds(corpus, pairs, "doc_id", 1)
    }
  }

  test("negativePairs: k per anchor, never self, negatives are real ids, rerun-stable") {
    val k = 3
    val got = Sampling.negativePairs(docs, "doc_id", k, shards = 4)
      .as[(Long, Long, Long)].collect()
    val ids = docs.select("doc_id").as[Long].collect().toSet
    // Every shard of 4 holds >= 2 of the fixture's ids, so every anchor
    // draws exactly k negatives.
    val perAnchor = got.groupBy(_._1)
    assert(perAnchor.keySet == ids)
    perAnchor.foreach { case (a, rows) =>
      assert(rows.length == k, s"anchor $a drew ${rows.length} negatives")
      assert(rows.map(_._2).toSet == (1L to k).toSet)
      rows.foreach { case (_, _, neg) =>
        assert(neg != a, s"anchor $a drew itself")
        assert(ids(neg), s"anchor $a drew unknown id $neg")
      }
    }
    // Deterministic under repartitioning (the training-resume property).
    val again = Sampling.negativePairs(docs.repartition(11), "doc_id", k,
      shards = 4).as[(Long, Long, Long)].collect()
    assert(again.sortBy(r => (r._1, r._2)).toSeq ==
      got.sortBy(r => (r._1, r._2)).toSeq)
  }

  test("exactNormalized folds case/punctuation/whitespace noise") {
    val df = Seq(
      (1L, "Hello, World!"),
      (2L, "hello   world"),
      (3L, "HELLO WORLD."),
      (4L, "different entirely")
    ).toDF("doc_id", "text")
    val got = Dedup.exactNormalized(df, "text", "doc_id")
      .select("canonical_id", "dup_count")
      .as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 3L), (4L, 1L)))
  }
}
