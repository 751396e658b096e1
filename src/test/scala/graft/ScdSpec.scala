package graft

import org.apache.spark.sql.functions._

import graft.lake.{LakeDataset, TrackedLake}

class ScdSpec extends SparkSpec {
  import spark.implicits._

  private def feedFixture(): TrackedLake = {
    val base = Seq((1L, "a", 10.0), (2L, "a", 20.0), (3L, "b", 30.0))
      .toDF("k", "g", "v")
    val t = TrackedLake(spark,
      LakeDataset.fromDataFrame(spark, base), logBase = true)   // seq 1
    t.upsert(Seq((2L, "a", 21.0), (4L, "b", 40.0)).toDF("k", "g", "v"),
      Seq("k"))                                                  // seq 2
    t.delete(Seq(3L).toDF("k"), Seq("k"))                        // seq 3
    t.upsert(Seq((3L, "c", 31.0)).toDF("k", "g", "v"), Seq("k")) // seq 4 (reinsert)
    t.upsert(Seq((2L, "a", 22.0)).toDF("k", "g", "v"), Seq("k")) // seq 5
    t
  }

  test("scdHistory builds one interval per state with correct validity") {
    val t = feedFixture()
    val h = t.scdHistory(Seq("k")).collect().map { r =>
      (r.getAs[Long]("k"), r.getAs[Double]("v"),
       r.getAs[Long]("_valid_from"),
       Option(r.getAs[Any]("_valid_to")).map(_.asInstanceOf[Long]),
       r.getAs[Boolean]("_current"))
    }.toSet
    assert(h == Set(
      (1L, 10.0, 1L, None, true),          // never touched
      (2L, 20.0, 1L, Some(2L), false),     // base, closed by first upsert
      (2L, 21.0, 2L, Some(5L), false),     // closed by second upsert
      (2L, 22.0, 5L, None, true),
      (3L, 30.0, 1L, Some(3L), false),     // closed by DELETE (no successor)
      (3L, 31.0, 4L, None, true),          // reinsert opens a new interval
      (4L, 40.0, 2L, None, true)))         // upsert-created key
  }

  test("current slice of the history equals the table's final state") {
    val t = feedFixture()
    val cur = t.scdHistory(Seq("k")).filter($"_current")
      .select("k", "g", "v").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(cur == Set((1L, "a", 10.0), (2L, "a", 22.0), (3L, "c", 31.0),
      (4L, "b", 40.0)))
  }

  test("historyAsOf reproduces tableAsOf at every intermediate seq") {
    val t = feedFixture()
    val h = t.scdHistory(Seq("k"))
    for (seq <- 1L to t.currentSeq) {
      val fromHistory = t.historyAsOf(h, seq).collect()
        .map(r => (r.getAs[Long]("k"), r.getAs[String]("g"),
          r.getAs[Double]("v"))).toSet
      val fromLog = t.tableAsOf(seq, Seq("k")).collect()
        .map(r => (r.getAs[Long]("k"), r.getAs[String]("g"),
          r.getAs[Double]("v"))).toSet
      assert(fromHistory == fromLog, s"divergence at seq $seq")
    }
  }

  test("history is one window pass over the log, not a per-seq replay") {
    val t = feedFixture()
    // 5 mutations must not mean 5 passes: exactly one Window (one shuffle
    // by key) computes every interval.
    val plan = t.scdHistory(Seq("k")).queryExecution.optimizedPlan
    val windows = plan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }.size
    assert(windows == 1, s"expected one window pass, got $windows")
  }
}
