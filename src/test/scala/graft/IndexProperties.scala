package graft

import java.nio.file.Files

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean

import graft.operators.{Dedup, MinhashIndex, StringCache}

/** Property tests for the persisted indexes: the string cache's id algebra
  * and the incremental MinHash index's equivalence with the full recompute,
  * under RANDOM batch splits — the hand-written specs pin one split each;
  * these pin the invariant itself.
  */
object IndexProperties extends Properties("Indexes") {

  private lazy val spark = SparkSpec.session
  import spark.implicits._

  // ------------------------------------------------------------ StringCache

  private val valueGen: Gen[String] =
    Gen.oneOf(Gen.alphaStr.map(_.take(6)), Gen.oneOf("a", "b", "c", "d"))

  private val batchesGen: Gen[List[List[String]]] =
    Gen.listOfN(3, Gen.listOfN(6, valueGen))

  property("stringCache: ids dense 1..size, unique, and batch-order-deterministic") =
    Prop.forAll(batchesGen) { batches =>
      val cache = StringCache.open(spark,
        Files.createTempDirectory("graft_prop_cat").toString)
      batches.foreach(b => if (b.nonEmpty) cache.extend(b.toDF("v"), "v"))
      val d = cache.dict.as[(String, Long)].collect().toList
      val ids = d.map(_._2).sorted
      val distinctAll = batches.flatten.distinct.size
      (d.size == distinctAll) :| s"size ${d.size} != distinct $distinctAll" &&
        (ids == (1L to d.size.toLong).toList) :| s"ids not dense: $ids" &&
        (d.map(_._1).distinct.size == d.size) :| "duplicate values"
    }

  property("stringCache: encode is invertible and id-stable across re-encode") =
    Prop.forAll(Gen.listOfN(8, valueGen)) { vs0 =>
      val vs = vs0.filter(_.nonEmpty)
      (vs.nonEmpty) ==> {
        val cache = StringCache.open(spark,
          Files.createTempDirectory("graft_prop_cat2").toString)
        val df = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("k", "v")
        val enc1 = cache.encode(df, "v").as[(Long, Long)].collect().toMap
        val enc2 = cache.encode(df, "v").as[(Long, Long)].collect().toMap
        val back = cache.decode(cache.encode(df, "v"), "v")
          .as[(Long, String)].collect().toMap
        (enc1 == enc2) :| "re-encode changed ids" &&
          (back == df.as[(Long, String)].collect().toMap) :| "decode∘encode != id"
      }
    }

  // ----------------------------------------------------------- MinhashIndex

  /** Small corpora with planted overlap: words from a tiny vocabulary so
    * random docs collide often enough to make pairs.
    */
  private val docGen: Gen[String] = for {
    n <- Gen.choose(6, 12)
    ws <- Gen.listOfN(n, Gen.oneOf("alpha", "beta", "gamma", "delta", "eps"))
  } yield ws.mkString(" ")

  private val corpusGen: Gen[List[(Long, String)]] =
    Gen.listOfN(10, docGen).map(_.zipWithIndex.map { case (t, i) => (i.toLong, t) })

  private val splitGen: Gen[(List[(Long, String)], Int)] = for {
    c <- corpusGen
    cut <- Gen.choose(1, 9)
  } yield (c, cut)

  property("minhashIndex: random 2-batch split reproduces the full recompute") =
    Prop.forAll(splitGen) { case (corpus, cut) =>
      val df = corpus.toDF("doc_id", "text")
      val full = Dedup.minhashDedup(df, "text", "doc_id", threshold = 0.4)
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
      val idx = MinhashIndex.open(spark,
        Files.createTempDirectory("graft_prop_mh").toString)
      val p1 = idx.addBatch(df.filter($"doc_id" < cut.toLong), "text", "doc_id", 0.4)
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
      val p2 = idx.addBatch(df.filter($"doc_id" >= cut.toLong), "text", "doc_id", 0.4)
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
      ((p1 ++ p2) == full) :| s"incremental ${(p1 ++ p2).size} != full ${full.size}"
    }

  // ------------------------------------------------------- erasure algebra

  private val eraseGen: Gen[(List[(Long, String)], Set[Long])] = for {
    c <- corpusGen
    erased <- Gen.someOf(c.map(_._1))
  } yield (c, erased.toSet)

  property("minhashIndex: remove(S) == an index never containing S") =
    Prop.forAll(eraseGen) { case (corpus, erased) =>
      val df = corpus.toDF("doc_id", "text")
      // Index A ingests everything then ERASES S; index B never saw S.
      // Their persisted state must answer identically for any future
      // batch — the ghost-freedom invariant under RANDOM erase sets.
      val a = MinhashIndex.open(spark,
        Files.createTempDirectory("graft_prop_rm_a").toString)
      a.addBatch(df, "text", "doc_id", 0.4)
      a.remove(erased.toSeq.toDF("doc_id"), "doc_id")
      val b = MinhashIndex.open(spark,
        Files.createTempDirectory("graft_prop_rm_b").toString)
      val bSurvivors = df.filter(!$"doc_id".isin(erased.toSeq: _*))
      b.addBatch(bSurvivors, "text", "doc_id", 0.4)
      val probe = df.withColumn("doc_id", $"doc_id" + 1000L)
      val pa = a.addBatch(probe, "text", "doc_id", 0.4)
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
      val pb = b.addBatch(probe, "text", "doc_id", 0.4)
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
      (pa == pb) :| s"erased-index pairs $pa != never-contained pairs $pb"
    }

  // ScalaCheck default is 100 runs/property; each of these runs several
  // Spark jobs, so trim to keep the suite's wall time sane.
  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(8)
}
