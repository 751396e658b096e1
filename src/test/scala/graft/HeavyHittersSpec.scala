package graft

import org.apache.spark.sql.functions._

import graft.operators.HeavyHitters

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  // Zipf-ish fixture: value i repeated (50 - i) times plus a long tail of
  // singletons — high cardinality relative to the heavy head.
  private def fixture = {
    val head = (0 until 40).flatMap(i => Seq.fill(50 - i)(f"h$i%02d"))
    val tail = (0 until 500).map(i => f"t$i%03d")
    spark.sparkContext.parallelize(head ++ tail, 8).toDF("v")
  }

  test("exact topK counts and deterministic tie-break") {
    val got = HeavyHitters.topK(fixture, "v", 3).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("h00", 50L), ("h01", 49L), ("h02", 48L)))
    // Ties (the 500 singletons + deep head) break by value ascending.
    val deep = HeavyHitters.topK(fixture, "v", 45).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(deep.take(40).map(_._1).toSeq == (0 until 40).map(i => f"h$i%02d"))
    assert(deep.slice(40, 45).map(_._1).toSeq ==
      Seq("t000", "t001", "t002", "t003", "t004"))
  }

  test("candidate-pruned topK equals exact above the frequency floor") {
    val n = fixture.count()
    val c = 50
    // floor = N/(c+1); every head value clears it on this fixture.
    assert(50.0 > n.toDouble / (c + 1))
    val exact = HeavyHitters.topK(fixture, "v", 20).collect().toSeq
    val pruned = HeavyHitters.topKCandidates(fixture, "v", 20, c).collect().toSeq
    assert(pruned == exact)
  }

  test("candidates include every value above N/(c+1) regardless of layout") {
    for (parts <- Seq(2, 8, 16)) {
      val df = fixture.repartition(parts)
      val n = df.count()
      val c = 30
      val floor = n.toDouble / (c + 1)
      val mustSurvive = HeavyHitters.topK(df, "v", 1000).collect()
        .filter(_.getLong(1) > floor).map(_.getString(0)).toSet
      val cand = HeavyHitters.localCandidates(df, "v", c).collect().toSet
      assert(mustSurvive.subsetOf(cand),
        s"parts=$parts missing ${mustSurvive.diff(cand)}")
    }
  }

  test("pass 1 ships at most partitions x c rows") {
    val df = fixture.repartition(4)
    val cand = HeavyHitters.localCandidates(df, "v", 10)
    assert(cand.count() <= 4 * 10)
  }

  test("nulls are ignored, not counted as a value") {
    val withNulls = fixture.union(Seq.fill(100)(null.asInstanceOf[String]).toDF("v"))
    val got = HeavyHitters.topK(withNulls, "v", 1).collect()
    assert(got.head.getString(0) == "h00")
    val pruned = HeavyHitters.topKCandidates(withNulls, "v", 1, 50).collect()
    assert(pruned.head.getString(0) == "h00")
  }
}
