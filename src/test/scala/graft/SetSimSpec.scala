package graft

import scala.util.Random

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Prefix-filter set-similarity join (AllPairs/PPJoin) vs the all-pairs
  * ground truth: the filter is a completeness THEOREM, so on every corpus —
  * fixture or randomized — the result must EQUAL the quadratic join's, not
  * approximate it (the contrast with MinHash LSH, whose recall is a tuning
  * outcome measured by OperatorsSpec).
  */
class SetSimSpec extends SparkSpec {
  import spark.implicits._

  private def allPairs(df: DataFrame, t: Double): Set[(Long, Long)] =
    Dedup.ngramJaccardPairs(df, "text", "doc_id", shingleSize = 3, threshold = t)
      .select($"doc_a".cast("long"), $"doc_b".cast("long"))
      .as[(Long, Long)].collect().toSet

  private def prefixPairs(df: DataFrame, t: Double): Set[(Long, Long)] =
    Dedup.setSimJoinPrefix(df, "text", "doc_id", shingleSize = 3, threshold = t)
      .select($"doc_a".cast("long"), $"doc_b".cast("long"))
      .as[(Long, Long)].collect().toSet

  test("equals the all-pairs join on the planted near-dup corpus") {
    val corpus = Fixtures.nearDupDocuments(spark, sf())
    val truth = allPairs(corpus, 0.5)
    assert(truth.nonEmpty, "fixture must plant near-dup pairs")
    assert(prefixPairs(corpus, 0.5) === truth)
  }

  test("equals the all-pairs join on randomized corpora across thresholds") {
    val rnd = new Random(42)
    val vocab = Vector("alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
      "golf", "hotel", "india", "juliet", "kilo", "lima")
    // 40 base docs; every 4th gets a near-copy with a small mutation —
    // plus organic collisions from the tiny vocabulary.
    val base = (0 until 40).map { i =>
      (i.toLong, Seq.fill(8 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val mutated = base.collect { case (i, t) if i % 4 == 0 =>
      (i + 1000L, t + " " + vocab(rnd.nextInt(vocab.size)))
    }
    val corpus = (base ++ mutated).toDF("doc_id", "text")
    for (t <- Seq(0.3, 0.5, 0.8)) {
      val truth = allPairs(corpus, t)
      assert(prefixPairs(corpus, t) === truth, s"threshold $t")
      if (t == 0.3) assert(truth.nonEmpty, "low threshold must match something")
    }
  }

  test("threshold 1.0 returns exactly the identical-shingle-set pairs") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps"),
      (2L, "the quick brown fox jumps"),      // exact copy of 1
      (3L, "the  quick   brown fox jumps"),   // whitespace-canonicalized copy
      (4L, "an entirely different document here")).toDF("doc_id", "text")
    assert(prefixPairs(corpus, 1.0) === Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("cross-corpus AB join: planted matches found, within-side pairs excluded, colliding ids kept apart") {
    val train = Seq(
      (1L, "alpha bravo charlie delta echo foxtrot"),
      (2L, "alpha bravo charlie delta echo foxtrot"),   // within-side dup of 1 — must NOT emit
      (3L, "golf hotel india juliet kilo lima")).toDF("doc_id", "text")
    val bench = Seq(
      (1L, "golf hotel india juliet kilo lima mike"),   // id collides with train 1; matches train 3
      (9L, "entirely unrelated words here now")).toDF("doc_id", "text")
    val got = Dedup.setSimJoinPrefixAB(train, bench, "text", "doc_id",
        shingleSize = 3, threshold = 0.5)
      .select($"doc_a".cast("long"), $"doc_b".cast("long"))
      .as[(Long, Long)].collect().toSet
    assert(got === Set((3L, 1L)))
  }

  test("AB join equals the quadratic cross ground truth on randomized corpora") {
    val rnd = new Random(7)
    val vocab = Vector("alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
      "golf", "hotel", "india", "juliet")
    val train = (0 until 30).map { i =>
      (i.toLong, Seq.fill(8 + rnd.nextInt(8))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val bench = train.collect { case (i, t) if i % 3 == 0 =>
      (i + 500L, t + " " + vocab(rnd.nextInt(vocab.size)))
    } ++ Seq((900L, "zulu yankee xray whiskey victor uniform"))
    val (ta, tb) = (train.toDF("doc_id", "text"), bench.toDF("doc_id", "text"))
    for (t <- Seq(0.4, 0.6)) {
      // ground truth: quadratic join of the two shingle tables
      val ga = Dedup.shingleRows(ta, "text", "doc_id", 3)
        .select($"doc".as("doc_a"), $"s")
      val gb = Dedup.shingleRows(tb, "text", "doc_id", 3)
        .select($"doc".as("doc_b"), $"s")
      val szA = ga.groupBy("doc_a").count().withColumnRenamed("count", "sza")
      val szB = gb.groupBy("doc_b").count().withColumnRenamed("count", "szb")
      val truth = ga.join(gb, "s").groupBy("doc_a", "doc_b").count()
        .join(szA, "doc_a").join(szB, "doc_b")
        .filter($"count".cast("double") / ($"sza" + $"szb" - $"count") >= t)
        .select($"doc_a".cast("long"), $"doc_b".cast("long"))
        .as[(Long, Long)].collect().toSet
      val got = Dedup.setSimJoinPrefixAB(ta, tb, "text", "doc_id", 3, t)
        .select($"doc_a".cast("long"), $"doc_b".cast("long"))
        .as[(Long, Long)].collect().toSet
      assert(got === truth, s"threshold $t")
      assert(truth.nonEmpty, s"threshold $t must match something")
    }
  }

  test("boundary pairs at exactly J == t survive float-hostile thresholds") {
    // For t = 0.07, fl(0.07 * 100) = 7.000…001, so a float ceil in the
    // length filter demands sz_a >= 8 and silently drops the pair at
    // exactly 7/100 = 0.07 — the advice-r14 false negative. The exact
    // integer bounds must keep it, at every threshold whose double
    // product overshoots. Doc 1's shingles are a prefix-subset of doc 2's,
    // so J = szA/szB exactly; (szA, szB) chosen per threshold so
    // szA/szB == t as a decimal.
    val w = (1 to 102).map(i => s"w$i")
    def pair(szA: Int, szB: Int): DataFrame = Seq(
      (1L, w.take(szA + 2).mkString(" ")),  // n words → n-2 shingles
      (2L, w.take(szB + 2).mkString(" "))).toDF("doc_id", "text")
    for ((t, szA, szB) <- Seq((0.07, 7, 100), (0.14, 7, 50),
        (0.28, 7, 25), (0.56, 14, 25))) {
      val sub = pair(szA, szB)
      val truth = allPairs(sub, t)
      assert(truth === Set((1L, 2L)), s"planted boundary pair must verify at $t")
      assert(prefixPairs(sub, t) === truth, s"threshold $t")
    }
  }

  test("exactRational decomposes doubles losslessly") {
    for (t <- Seq(0.07, 0.14, 0.28, 0.3, 0.5, 0.56, 0.8, 1.0, 0.001)) {
      val (num, den) = Dedup.exactRational(t)
      assert(num.toDouble / den.toDouble === t, s"t=$t -> $num/$den")
      // reduced: power-of-two denominator with odd numerator (or 1/1)
      assert(den == 1L || (den & (den - 1)) == 0L)
      assert(den == 1L || (num & 1L) == 1L)
    }
  }

  test("single-shingle (short) documents are joinable, not dropped") {
    val corpus = Seq(
      (1L, "tiny doc"),   // < 3 words: whole text is the one shingle
      (2L, "tiny doc"),
      (3L, "other")).toDF("doc_id", "text")
    assert(prefixPairs(corpus, 0.5) === Set((1L, 2L)))
  }
}
