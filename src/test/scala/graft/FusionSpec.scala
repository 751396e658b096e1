package graft

import org.apache.spark.sql.functions._

import graft.operators.Fusion

/** RRF rank fusion: single-ranking fusion preserves order, documents in
  * BOTH rankings outrank same-position single-ranking documents, missing
  * documents contribute zero, and the integer grid is deterministic.
  */
class FusionSpec extends SparkSpec {
  import spark.implicits._

  test("one ranking fuses to its own order") {
    val r = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("doc", "rk")
    val out = Fusion.rrf(Seq(r), "doc", "rk", 3)
      .select("doc").as[Long].collect().toSeq
    assert(out == Seq(10L, 20L, 30L))
  }

  test("a doc in both rankings beats same-rank docs in one") {
    // doc 5 is rank 2 in both; docs 1 and 2 are rank 1 in exactly one:
    // 5 gets 2/(60+2) > 1/(60+1) -> 5 wins
    val a = Seq((1L, 1), (5L, 2)).toDF("doc", "rk")
    val b = Seq((2L, 1), (5L, 2)).toDF("doc", "rk")
    val out = Fusion.rrf(Seq(a, b), "doc", "rk", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out.head._1 == 5L, out.toString)
    // exact grid: 2 * (1000000 div 62) vs 1000000 div 61
    assert(out.head._2 == 2L * (1000000L / 62L))
    assert(out.tail.map(_._2).toSet == Set(1000000L / 61L))
    // ties break by id
    assert(out.tail.map(_._1).toSeq == Seq(1L, 2L))
  }

  test("hybrid gate shape: fusing 20-deep rankings returns exactly k") {
    val a = (1L to 20L).map(i => (i, i.toInt)).toDF("doc", "rk")
    val b = (11L to 30L).map(i => (i, (i - 10).toInt)).toDF("doc", "rk")
    val out = Fusion.rrf(Seq(a, b), "doc", "rk", 15).collect()
    assert(out.length == 15)
    // overlap region (11..20) dominates the head of the fused list
    assert(out.take(5).forall(r => r.getLong(0) >= 11L && r.getLong(0) <= 20L))
  }
}
