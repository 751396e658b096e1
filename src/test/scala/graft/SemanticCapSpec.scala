package graft

import graft.operators.Dedup

/** Pins the SemDeDup cluster-skew guard: a planted mega-cluster (one
  * vector copied far past `spark.graft.dedup.clusterCap`) must engage the
  * hyperplane sub-bucketing AND return the identical pair set — exact
  * copies share a signature by construction, so the guard may only cut
  * quadratic cost, never drop an exact-duplicate pair.
  */
class SemanticCapSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 8

  private lazy val fixture = {
    val rnd = new scala.util.Random(7L)
    val base = Seq.fill(dim)(rnd.nextGaussian().toFloat)
    // 60 exact copies -> one k-means mega-cluster; 15 scattered singles.
    val copies = (0L until 60L).map(i => (i, base))
    val singles = (100L until 115L).map(i => (i, Seq.fill(dim)(rnd.nextGaussian().toFloat)))
    (copies ++ singles).toDF("vec_id", "embedding")
  }

  private def pairs(cap: Int): Set[(Long, Long)] = {
    spark.conf.set("spark.graft.dedup.clusterCap", cap.toString)
    try Dedup.semanticDedup(fixture, "embedding", "vec_id",
        numClusters = 4, dim = dim)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    finally spark.conf.unset("spark.graft.dedup.clusterCap")
  }

  test("unguarded run finds exactly the all-pairs of the copy group") {
    val expected = (for {
      a <- 0L until 60L; b <- (a + 1) until 60L
    } yield (a, b)).toSet
    assert(pairs(1000000) == expected)
  }

  test("mega-cluster over the cap engages sub-bucketing, identical pairs") {
    // cap 20 vs a 60-member cluster -> 2 hyperplanes; the guard must be
    // visible in the plan (the signature expression appears) and the
    // result must not change (identical vectors share every signature).
    spark.conf.set("spark.graft.dedup.clusterCap", "20")
    val plan = try Dedup.semanticDedup(fixture, "embedding", "vec_id",
        numClusters = 4, dim = dim).queryExecution.analyzed.toString
      finally spark.conf.unset("spark.graft.dedup.clusterCap")
    assert(plan.toLowerCase.contains("hyperplanesig"),
      s"cluster cap did not engage hyperplane sub-bucketing:\n$plan")
    assert(pairs(20) == pairs(1000000))
  }

  test("clusters under the cap keep the exact single-bucket plan") {
    val plan = Dedup.semanticDedup(fixture, "embedding", "vec_id",
      numClusters = 4, dim = dim).queryExecution.analyzed.toString
    assert(!plan.toLowerCase.contains("hyperplanesig"))
  }
}
