package graft

import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.operators.Dedup

/** Prefix-filter set-similarity join invariants on randomized corpora:
  * completeness (equality with the quadratic ground truth is checked in
  * SetSimSpec; here the algebraic laws), threshold monotonicity, and
  * symmetry of the emitted Jaccard values.
  */
object SetSimProperties extends Properties("SetSimJoin") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5)

  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private val vocab = Vector("ash", "birch", "cedar", "dune", "elm",
    "fern", "grove", "heath", "iris", "jade")

  private val corpusGen: Gen[List[(Long, String)]] = for {
    n <- Gen.choose(10, 25)
    seed <- Gen.choose(0L, 1000000L)
  } yield {
    val rnd = new scala.util.Random(seed)
    val base = (0 until n).map { i =>
      (i.toLong,
        Seq.fill(6 + rnd.nextInt(8))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }.toList
    val dups = base.collect { case (i, t) if i % 3 == 0 =>
      (i + 1000L, t + " " + vocab(rnd.nextInt(vocab.size)))
    }
    base ++ dups
  }

  private def pairsAt(corpus: List[(Long, String)], t: Double): Set[(Long, Long)] =
    Dedup.setSimJoinPrefix(corpus.toDF("doc_id", "text"), "text", "doc_id",
        shingleSize = 3, threshold = t)
      .select($"doc_a".cast("long"), $"doc_b".cast("long"))
      .as[(Long, Long)].collect().toSet

  property("raising the threshold only removes pairs (anti-monotone result set)") =
    Prop.forAll(corpusGen) { corpus =>
      val lo = pairsAt(corpus, 0.3)
      val hi = pairsAt(corpus, 0.7)
      hi.subsetOf(lo)
    }

  property("emitted jaccard values respect the threshold and never exceed 1") =
    Prop.forAll(corpusGen) { corpus =>
      val rows = Dedup.setSimJoinPrefix(corpus.toDF("doc_id", "text"),
          "text", "doc_id", shingleSize = 3, threshold = 0.4)
        .select($"jaccard").as[Double].collect()
      rows.forall(j => j >= 0.4 && j <= 1.0)
    }

  property("AB join with B == A recovers exactly the self-join's cross pairs") =
    Prop.forAll(corpusGen) { corpus =>
      val df = corpus.toDF("doc_id", "text")
      // A x A emits both orientations and the diagonal; the self-join
      // emits each unordered pair once with a < b. Project A x A down.
      val ab = Dedup.setSimJoinPrefixAB(df, df, "text", "doc_id", 3, 0.5)
        .select($"doc_a".cast("long"), $"doc_b".cast("long"))
        .as[(Long, Long)].collect()
        .filter { case (a, b) => a < b }.toSet
      ab == pairsAt(corpus, 0.5)
    }
}
