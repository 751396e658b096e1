package graft

import graft.operators.MaterializedAgg
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class MatViewSpec extends SparkSpec {
  import spark.implicits._

  private def specs = Seq(
    MaterializedAgg.count("n"),
    MaterializedAgg.sumDecimal("v", "total"),
    MaterializedAgg.min("v", "mn"),
    MaterializedAgg.max("v", "mx"))

  private def oneShot(df: DataFrame): Seq[org.apache.spark.sql.Row] =
    df.groupBy("g")
      .agg(count(lit(1)).as("n"), sum(col("v").cast("decimal(38,2)")).as("total"),
        min("v").as("mn"), max("v").as("mx"))
      .orderBy("g").collect().toSeq

  test("incremental view equals one-shot aggregate after several inserts") {
    val base = Seq(("a", 1.0), ("a", 2.5), ("b", 10.0)).toDF("g", "v")
    val mv = MaterializedAgg.build(base, Seq("g"), specs)
    // delta 1 touches an existing group and creates a NEW one
    val d1 = Seq(("a", 4.0), ("c", 7.25)).toDF("g", "v")
    // delta 2 lowers a min and raises a max
    val d2 = Seq(("b", -3.0), ("c", 100.0), ("b", 99.0)).toDF("g", "v")
    mv.applyInsert(d1)
    mv.applyInsert(d2)
    val got = mv.state.orderBy("g").collect().toSeq
    val want = oneShot(base.union(d1).union(d2))
    assert(got == want)
  }

  test("null measures: no contribution, never a fabricated zero") {
    val base = Seq(("a", Some(1.0)), ("nul", None)).toDF("g", "v")
    val mv = MaterializedAgg.build(base, Seq("g"), specs)
    // the all-null group stays null through a merge with another null batch
    val d1 = Seq(("nul", Option.empty[Double]), ("a", Some(2.0))).toDF("g", "v")
    mv.applyInsert(d1)
    val rows = mv.state.orderBy("g").collect()
    val nul = rows.find(_.getString(0) == "nul").get
    assert(nul.getLong(1) == 2L) // count counts rows, not values
    assert(nul.isNullAt(2) && nul.isNullAt(3) && nul.isNullAt(4),
      s"all-null group must stay null: $nul")
    // ... and a later real value replaces null without adding zero
    mv.applyInsert(Seq(("nul", Some(-5.5))).toDF("g", "v"))
    val after = mv.state.filter(col("g") === "nul").collect()(0)
    assert(after.getDecimal(2).doubleValue() == -5.5)
    assert(after.getDouble(3) == -5.5 && after.getDouble(4) == -5.5)
    assert(mv.state.orderBy("g").collect().toSeq ==
      oneShot(base.union(d1).union(Seq(("nul", Some(-5.5))).toDF("g", "v"))))
  }

  test("null GROUP KEY is one group, merged across batches") {
    val base = Seq((Option("a"), 1.0), (Option.empty[String], 5.0)).toDF("g", "v")
    val mv = MaterializedAgg.build(base, Seq("g"), specs)
    mv.applyInsert(Seq((Option.empty[String], 3.0)).toDF("g", "v"))
    val got = mv.state.orderBy("g").collect().toSeq
    val want = oneShot(base.union(Seq((Option.empty[String], 3.0)).toDF("g", "v")))
    assert(got == want)
    assert(got.count(_.isNullAt(0)) == 1, "null key must merge into ONE group")
  }

  test("maintenance plan never rescans the base table") {
    val root = java.nio.file.Files.createTempDirectory("graft_mv_base").toString
    try {
      val base = Seq(("a", 1.0), ("b", 2.0)).toDF("g", "v")
      base.write.parquet(s"$root/base")
      val baseDf = spark.read.parquet(s"$root/base")
      val mv = MaterializedAgg.build(baseDf, Seq("g"), specs)
      mv.applyInsert(Seq(("a", 9.0)).toDF("g", "v"))
      // after build, no plan in the maintained state may read base files
      val scans = org.apache.spark.sql.graftbridge.Bridge.scanRootPaths(mv.state)
      assert(!scans.exists(_.contains("base")),
        s"state plan rescans the base: $scans")
    } finally graft.lake.LakeDataset.deleteRecursively(java.nio.file.Paths.get(root))
  }

  test("many merges stay bounded: lineage cuts keep the state plan flat") {
    val base = Seq(("a", 1.0)).toDF("g", "v")
    val mv = MaterializedAgg.build(base, Seq("g"), specs)
    var want = Seq(("a", 1.0))
    (1 to 20).foreach { i =>
      val d = Seq(("a", i.toDouble), (s"g${i % 3}", i * 0.5))
      mv.applyInsert(d.toDF("g", "v"))
      want = want ++ d
    }
    assert(mv.state.orderBy("g").collect().toSeq == oneShot(want.toDF("g", "v")))
    // the checkpointed state's plan must not have grown with merge count
    val depth = mv.state.queryExecution.optimizedPlan.collectLeaves().size
    assert(depth <= MaterializedAgg.CheckpointEvery + 2,
      s"state plan holds $depth leaves after 21 merges")
  }

  test("streaming foreachBatch maintains base lake and view together") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = Seq(("a", 1.0), ("b", 2.0)).toDF("g", "v")
    val ds = graft.lake.LakeDataset.fromDataFrame(spark, base)
    val mv = MaterializedAgg.build(base, Seq("g"), specs)
    val mem = MemoryStream[(String, Double)]
    val q = mem.toDF().toDF("g", "v").writeStream
      .foreachBatch(graft.streaming.StreamingIngest.insertWithView(ds, mv))
      .start()
    try {
      mem.addData(("a", 5.0), ("c", 3.0))
      q.processAllAvailable()
      mem.addData(("c", -1.0))
      q.processAllAvailable()
    } finally q.stop()
    val want = oneShot(base.union(
      Seq(("a", 5.0), ("c", 3.0), ("c", -1.0)).toDF("g", "v")))
    assert(mv.state.orderBy("g").collect().toSeq == want)
    // the base lake saw the same rows the view folded
    assert(ds.toDF.count() == 5)
  }

  test("rebuild resets after non-insert mutations") {
    val base = Seq(("a", 1.0), ("b", 2.0)).toDF("g", "v")
    val mv = MaterializedAgg.build(base, Seq("g"), specs)
    // pretend rows were deleted from the base: incremental is invalid, rebuild
    val newBase = Seq(("a", 1.0)).toDF("g", "v")
    mv.rebuild(newBase)
    assert(mv.state.orderBy("g").collect().toSeq == oneShot(newBase))
  }

  test("delete: targeted group refresh is exact; untouched groups keep state") {
    val base = Seq(("a", 1.0), ("a", 2.0), ("b", 10.0), ("b", 20.0),
      ("c", 5.0), (null.asInstanceOf[String], 7.0)).toDF("g", "v")
    val mv = MaterializedAgg.build(base, Seq("g"), specs)
    // delete one 'a' row, ALL of 'c', and the null-group row
    val deleted = Seq(("a", 2.0), ("c", 5.0),
      (null.asInstanceOf[String], 7.0)).toDF("g", "v")
    val after = Seq(("a", 1.0), ("b", 10.0), ("b", 20.0)).toDF("g", "v")
    mv.refreshGroups(after, deleted)
    val got = mv.state.orderBy("g").collect().toSeq
    assert(got == oneShot(after))
    assert(!got.exists(r => r.getString(0) == "c" || r.isNullAt(0)),
      "fully-deleted groups (incl. the null group) must disappear")
  }

  test("all-groups DELETE escapes to one-shot rebuild; narrow DELETE stays targeted") {
    val d = new graft.lake.Database(spark)
    // 100 groups × 4 rows — wide enough that an all-groups mutation clears
    // the small-touched short-circuit in the maintenance path selector.
    val base = (1 to 400).map(i => (s"g${i % 100}", i.toDouble)).toDF("g", "v")
    d.register("mvdeg_t", graft.lake.LakeDataset.fromDataFrame(spark, base))
    d.executeDml(
      """CREATE MATERIALIZED VIEW mvdeg_v AS
        |SELECT g, COUNT(*) AS n, SUM(v) AS total FROM mvdeg_t GROUP BY g""".stripMargin)
    assert(d.mvRebuildCount("mvdeg_v") == 0)
    def recompute(): Seq[org.apache.spark.sql.Row] = d.executeSql(
      """SELECT g, COUNT(*) AS n, SUM(CAST(v AS DECIMAL(38,2))) AS total
        |FROM mvdeg_t GROUP BY g ORDER BY g""".stripMargin).collect().toSeq
    def view(): Seq[org.apache.spark.sql.Row] = d.executeSql(
      "SELECT g, n, total FROM mvdeg_v ORDER BY g").collect().toSeq

    // Narrow delete (1 of 100 groups): must keep the targeted path.
    d.executeDml("DELETE FROM mvdeg_t WHERE g = 'g7'")
    assert(d.mvRebuildCount("mvdeg_v") == 0, "narrow delete must stay targeted")
    assert(view() == recompute())

    // v <= 350 hits every remaining group (residues 1..99,0 all appear in
    // 1..350) — touched ≈ all, so the selector must take the one-shot
    // rebuild, and the post-state (50 surviving groups) must stay exact.
    d.executeDml("DELETE FROM mvdeg_t WHERE v <= 350")
    assert(d.mvRebuildCount("mvdeg_v") == 1,
      "all-groups delete must escape to the one-shot rebuild")
    val after = view()
    assert(after == recompute() && after.size == 50)
  }

  test("delete then insert keeps composing correctly") {
    val base = Seq(("a", 1.0), ("b", 2.0), ("b", 4.0)).toDF("g", "v")
    val mv = MaterializedAgg.build(base, Seq("g"), specs)
    val deleted = Seq(("b", 2.0)).toDF("g", "v")
    val afterDel = Seq(("a", 1.0), ("b", 4.0)).toDF("g", "v")
    mv.refreshGroups(afterDel, deleted)
    mv.applyInsert(Seq(("b", -1.0), ("d", 0.5)).toDF("g", "v"))
    val want = oneShot(afterDel.union(Seq(("b", -1.0), ("d", 0.5)).toDF("g", "v")))
    assert(mv.state.orderBy("g").collect().toSeq == want)
  }
}
