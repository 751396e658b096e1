package graft

import org.apache.spark.sql.functions._

import graft.operators.Recall

/** The recall gate's judgment logic, plus the three shipped gate
  * compositions at sf0.001 — the gates themselves are oracle-checked by
  * the driver at sf0.01; here we pin the status semantics (a healthy
  * approximate path reads `ok`, a degraded one flips the row).
  */
class RecallSpec extends SparkSpec {
  import spark.implicits._

  private def keys(ps: (Long, Long)*) = ps.toDF("qid", "vid")

  test("ok when recall clears the floor; judgment is micro-averaged") {
    val exact = keys((1L, 10L), (1L, 11L), (2L, 10L), (2L, 12L))
    val approx = keys((1L, 10L), (1L, 11L), (2L, 10L), (2L, 99L))
    // 3/4 hits = 750 permille
    val ok = Recall.gate(approx, exact, Seq("qid", "vid"), 700, 2)
      .as[(String, Long)].collect()
    assert(ok === Array(("ok", 4L)))
    val bad = Recall.gate(approx, exact, Seq("qid", "vid"), 800, 2)
      .as[(String, Long)].collect()
    assert(bad === Array(("recall_below_threshold", 4L)))
  }

  test("approx-only extras never inflate recall; duplicates dedupe") {
    val exact = keys((1L, 10L), (1L, 11L))
    val approx = keys((1L, 10L), (1L, 10L), (1L, 77L), (1L, 88L), (1L, 99L))
    // 1/2 hits regardless of the extras and the duplicate
    val r = Recall.gate(approx, exact, Seq("qid", "vid"), 500, 2)
      .as[(String, Long)].collect()
    assert(r === Array(("ok", 2L)))
    assert(Recall.gate(approx, exact, Seq("qid", "vid"), 501, 2)
      .as[(String, Long)].collect() === Array(("recall_below_threshold", 2L)))
  }

  test("coverage sentinel: a broken (shrunken/empty) truth set is loud") {
    val exact = keys((1L, 10L))
    val approx = keys((1L, 10L))
    assert(Recall.gate(approx, exact, Seq("qid", "vid"), 500, 2)
      .as[(String, Long)].collect() === Array(("truth_too_small", 1L)))
    assert(Recall.gate(approx, exact.limit(0), Seq("qid", "vid"), 500, 1)
      .as[(String, Long)].collect() === Array(("truth_too_small", 0L)))
  }

  test("the three shipped recall gates read ok at sf0.001") {
    for (g <- Seq("ann_recall_ivf", "ann_recall_pq", "dedup_recall_minhash")) {
      val row = SparkEntry.queries(g)(spark, sf()).collect()
      assert(row.length == 1, g)
      assert(row.head.getString(0) == "ok", s"$g: ${row.head}")
    }
  }
}
