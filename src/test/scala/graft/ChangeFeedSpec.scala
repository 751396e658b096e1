package graft

import graft.lake.{LakeDataset, TrackedLake}
import graft.operators.MaterializedAgg
import org.apache.spark.sql.functions._

class ChangeFeedSpec extends SparkSpec {
  import spark.implicits._

  private def mkTable() = LakeDataset.fromDataFrame(spark,
    Seq((1L, "a", 10.0), (2L, "a", 20.0), (3L, "b", 30.0)).toDF("k", "g", "v"))

  private def specs = Seq(
    MaterializedAgg.count("n"),
    MaterializedAgg.sumDecimal("v", "total"),
    MaterializedAgg.min("v", "mn"),
    MaterializedAgg.max("v", "mx"))

  test("ops log with images: insert rows, upsert pre/post, delete pre-image") {
    val t = TrackedLake(spark, mkTable())
    t.insert(Seq((4L, "b", 40.0)).toDF("k", "g", "v"))
    // upsert moves key 1 from group a to group b and changes v
    t.upsert(Seq((1L, "b", 11.0), (5L, "c", 50.0)).toDF("k", "g", "v"), Seq("k"))
    t.delete(Seq(2L).toDF("k"), Seq("k"))

    val log = t.changesSince(0L).collect()
      .map(r => (r.getAs[Long]("_seq"), r.getAs[String]("_op"),
        r.getAs[Long]("k"), r.getAs[String]("g"), r.getAs[Double]("v")))
    assert(log.filter(_._2 == "I").toSet == Set((1L, "I", 4L, "b", 40.0)))
    // pre-image: key 1 as it was; key 5 did not exist -> no pre row
    assert(log.filter(_._2 == "U-").toSet == Set((2L, "U-", 1L, "a", 10.0)))
    // post-image: merged rows read back from the table
    assert(log.filter(_._2 == "U+").toSet ==
      Set((2L, "U+", 1L, "b", 11.0), (2L, "U+", 5L, "c", 50.0)))
    // delete logs the full pre-image row, not just the key
    assert(log.filter(_._2 == "D").toSet == Set((3L, "D", 2L, "a", 20.0)))
    assert(t.currentSeq == 3L)
  }

  test("changesSince prunes to the tail cells; vacuum drops consumed ones") {
    val t = TrackedLake(spark, mkTable())
    val s1 = t.insert(Seq((10L, "c", 1.0)).toDF("k", "g", "v"))
    val s2 = t.insert(Seq((11L, "c", 2.0)).toDF("k", "g", "v"))
    val tail = t.changesSince(s1)
    assert(tail.select("k").as[Long].collect().toSeq == Seq(11L))
    // one cell per mutation: the tail read PLANS only the unconsumed cell
    assert(t.log.numParts == 2)
    assert(t.changesSince(s1).queryExecution.optimizedPlan
      .collectLeaves().size == 1)
    assert(t.changesSince(s2).isEmpty)
    // retention: consumed cells drop wholesale; numbering continues
    t.vacuum(s1)
    assert(t.log.numParts == 1)
    assert(t.changesSince(0L).select("k").as[Long].collect().toSeq == Seq(11L))
    val s3 = t.insert(Seq((12L, "c", 3.0)).toDF("k", "g", "v"))
    assert(s3 == s2 + 1)
  }

  test("log-driven view maintenance equals a rebuilt view (incl. group moves)") {
    val t = TrackedLake(spark, mkTable())
    val mv = MaterializedAgg.build(t.table.toDF, Seq("g"), specs)
    var mark = t.currentSeq

    // a mixed batch of mutations, including a group MOVE (key 1: a -> b)
    // and inserts into a group an upsert also touches
    t.insert(Seq((6L, "b", 60.0), (7L, "d", 70.0)).toDF("k", "g", "v"))
    t.upsert(Seq((1L, "b", 11.0)).toDF("k", "g", "v"), Seq("k"))
    t.delete(Seq(3L).toDF("k"), Seq("k"))
    mark = t.applyChangesTo(mv, mark)

    def expect() = t.table.toDF.groupBy("g")
      .agg(count(lit(1)).as("n"), sum(col("v").cast("decimal(38,2)")).as("total"),
        min("v").as("mn"), max("v").as("mx"))
      .orderBy("g").collect().toSeq
    assert(mv.state.orderBy("g").collect().toSeq == expect())

    // a second round continues from the mark
    t.insert(Seq((8L, "a", 80.0)).toDF("k", "g", "v"))
    t.upsert(Seq((8L, "e", 81.0)).toDF("k", "g", "v"), Seq("k"))
    mark = t.applyChangesTo(mv, mark)
    assert(mv.state.orderBy("g").collect().toSeq == expect())
    assert(t.applyChangesTo(mv, mark) == mark, "no changes -> same mark")
  }

  test("time travel: tableAsOf reproduces every intermediate state") {
    val t = TrackedLake(spark, mkTable(), logBase = true)
    def snap(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "g", "v").collect().map(r =>
        (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    val states = scala.collection.mutable.Map(t.currentSeq -> snap(t.table.toDF))
    val s1 = t.insert(Seq((4L, "c", 40.0)).toDF("k", "g", "v"))
    states(s1) = snap(t.table.toDF)
    // group move + value change + brand-new key
    val s2 = t.upsert(Seq((1L, "c", 11.0), (5L, "d", 50.0)).toDF("k", "g", "v"),
      Seq("k"))
    states(s2) = snap(t.table.toDF)
    val s3 = t.delete(Seq(2L, 4L).toDF("k"), Seq("k"))
    states(s3) = snap(t.table.toDF)
    // re-insert a previously deleted key: later seq must win
    val s4 = t.insert(Seq((2L, "e", 2.0)).toDF("k", "g", "v"))
    states(s4) = snap(t.table.toDF)
    states.foreach { case (mark, want) =>
      assert(snap(t.tableAsOf(mark, Seq("k"))) == want, s"as of $mark")
    }
  }

  test("checkpoint collapses the prefix; reads at or past the mark survive") {
    val t = TrackedLake(spark, mkTable(), logBase = true) // seq 1 = base
    val s1 = t.insert(Seq((4L, "c", 40.0)).toDF("k", "g", "v"))
    val s2 = t.upsert(Seq((1L, "c", 11.0), (5L, "d", 50.0)).toDF("k", "g", "v"),
      Seq("k"))
    val s3 = t.delete(Seq(2L).toDF("k"), Seq("k"))
    val s4 = t.insert(Seq((6L, "e", 60.0)).toDF("k", "g", "v"))
    def snap(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "g", "v").collect().map(r =>
        (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    val wantS2 = snap(t.tableAsOf(s2, Seq("k")))
    val wantS4 = snap(t.table.toDF)
    val tailRows = t.changesSince(s2).count()
    assert(t.log.numParts == 5)

    t.checkpoint(s2, Seq("k"))
    // prefix (base, insert, upsert = 3 cells) collapsed into one base cell
    assert(t.log.numParts == 3)
    // time travel at and past the mark is unchanged across the boundary
    assert(snap(t.tableAsOf(s2, Seq("k"))) == wantS2)
    assert(snap(t.tableAsOf(s4, Seq("k"))) == wantS4)
    // tail reads past the mark never see the base cell
    assert(t.changesSince(s2).count() == tailRows)
    assert(t.changesSince(s2).filter(col("_seq") <= s2).isEmpty)
    // a new consumer bootstraps from base + tail: replaying everything
    // since (s2 - 1) onto an empty view equals the current table's truth
    val mv = MaterializedAgg.build(
      t.table.toDF.limit(0), Seq("g"), specs)
    t.applyChangesTo(mv, s2 - 1)
    val want = t.table.toDF.groupBy("g")
      .agg(count(lit(1)).as("n"),
        sum(col("v").cast("decimal(38,2)")).as("total"),
        min(col("v")).as("mn"), max(col("v")).as("mx"))
      .collect().map(_.toSeq).toSet
    assert(mv.state.collect().map(_.toSeq).toSet == want)
    // numbering continues past the checkpoint
    assert(t.insert(Seq((7L, "e", 70.0)).toDF("k", "g", "v")) == s4 + 1)
    assert(s1 < s2 && s3 == s2 + 1)
  }

  test("tableAsOf plans only the cells at or below the mark") {
    val t = TrackedLake(spark, mkTable(), logBase = true) // seq 1 = base
    val s2 = t.insert(Seq((4L, "c", 40.0)).toDF("k", "g", "v"))
    t.checkpoint(s2, Seq("k"))
    // post-checkpoint tail: two more mutations = two more cells
    t.insert(Seq((5L, "d", 50.0)).toDF("k", "g", "v"))
    t.upsert(Seq((1L, "c", 11.0)).toDF("k", "g", "v"), Seq("k"))
    assert(t.log.numParts == 3)
    // A reconstruction AT the checkpoint mark must plan the base cell
    // alone — one leaf, not one per post-mark mutation (the seq upper
    // bound prunes through the same zone machinery as changesSince).
    val asOf = t.tableAsOf(s2, Seq("k"))
    assert(asOf.queryExecution.optimizedPlan.collectLeaves().size == 1,
      asOf.queryExecution.optimizedPlan.treeString)
    assert(asOf.select("k").as[Long].collect().toSet == Set(1L, 2L, 3L, 4L))
    // The bounded SCD2 read prunes identically and reproduces the mark.
    val hist = t.scdHistory(Seq("k"), Some(s2))
    assert(hist.queryExecution.optimizedPlan.collectLeaves().size == 1)
    assert(t.historyAsOf(hist, s2).select("k").as[Long].collect().toSet ==
      Set(1L, 2L, 3L, 4L))
  }

  test("auto-checkpoint bounds the log at the consumers' low-water mark") {
    val t = TrackedLake(spark, mkTable(), logBase = true,
      autoCheckpoint = Some((5, Seq("k"))))
    // No consumer registered: history must accumulate untouched.
    (0 until 7).foreach(i =>
      t.insert(Seq((100L + i, "c", i * 1.0)).toDF("k", "g", "v")))
    assert(t.log.numParts == 8, "nothing may collapse before an ack")
    // A consumer that acks every change: the log stays bounded from here on
    // no matter how many mutations land.
    // The collapse fires on the first mutation AFTER an ack — the existing
    // backlog drains then; from that point the bound must hold.
    var maxCells = 0
    (0 until 20).foreach { i =>
      val s =
        if (i % 5 == 4) t.upsert(Seq((100L + i, "e", 1.0)).toDF("k", "g", "v"), Seq("k"))
        else if (i % 5 == 3) t.delete(Seq(100L + (i % 7)).toDF("k"), Seq("k"))
        else t.insert(Seq((200L + i, "d", i * 1.0)).toDF("k", "g", "v"))
      t.ack("replica", s)
      if (i >= 1) maxCells = math.max(maxCells, t.log.numParts)
    }
    assert(maxCells <= 6, s"log grew to $maxCells cells despite the bound of 5")
    // Everything a caught-up consumer needs survives: the reconstruction at
    // the current mark equals the table, and the tail read stays empty.
    def snap(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "g", "v").collect().map(r =>
        (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(snap(t.tableAsOf(t.currentSeq, Seq("k"))) == snap(t.table.toDF))
    assert(t.changesSince(t.currentSeq).isEmpty)
    // A lagging second consumer halts further collapse below its mark.
    val lag = t.insert(Seq((999L, "z", 9.0)).toDF("k", "g", "v"))
    t.ack("slow", lag)
    (0 until 8).foreach { i =>
      val s = t.insert(Seq((300L + i, "d", 1.0)).toDF("k", "g", "v"))
      t.ack("replica", s)
    }
    assert(t.lowWaterMark == lag)
    assert(t.changesSince(lag).count() == 8,
      "the slow consumer's unconsumed tail must survive auto-checkpointing")
  }

  test("bigint-keyed capture routes through pruned cells and stays exact") {
    // Partitioned + bloomed on the mutation key: every part's k-zone spans
    // the whole id range (ids interleave mod 4), so blooms are what prune.
    // Disk-backed so pruning is visible as plan leaves (in-memory parts all
    // slice one snapshot and always plan one leaf).
    val root = java.nio.file.Files.createTempDirectory("graft_feedprobe").toString
    val base = spark.range(0, 400).select(col("id").as("k"),
      (col("id") % 4).cast("string").as("g"), (col("id") * 1.0).as("v"))
    LakeDataset.fromDataFrame(spark, base,
      partitionCols = Seq("g"), bloomCols = Seq("k"),
      storage = Some(graft.model.StorageSpec(root))).toStorage()
    val table = LakeDataset.fromStorage(spark, root)
    try {
    assert(table.numParts == 4)
    // Evidence the probe machinery prunes on this fixture: one key keeps
    // one cell DIRECTORY (the same call keyImage now routes through), vs
    // all four for the full-table scan the old capture paid.
    def dirs(df: org.apache.spark.sql.DataFrame) =
      org.apache.spark.sql.graftbridge.Bridge.scanRootPaths(df).size
    assert(dirs(table.prunedByLongKeys("k", Array(5L))) == 1)
    assert(dirs(table.toDF) == 4)

    val t = TrackedLake(spark, table)
    t.upsert(Seq((5L, "1", 99.0), (401L, "1", 1.0)).toDF("k", "g", "v"),
      Seq("k"))
    t.delete(Seq(6L).toDF("k"), Seq("k"))
    val log = t.changesSince(0L).collect()
      .map(r => (r.getAs[String]("_op"), r.getAs[Long]("k"),
        r.getAs[String]("g"), r.getAs[Double]("v"))).toSet
    // pre-image found through the pruned scan; brand-new key 401 has no pre
    assert(log == Set(
      ("U-", 5L, "1", 5.0),
      ("U+", 5L, "1", 99.0), ("U+", 401L, "1", 1.0),
      ("D", 6L, "2", 6.0)))
    assert(t.table.toDF.filter(col("k") === 6L).isEmpty)
    } finally LakeDataset.deleteRecursively(java.nio.file.Paths.get(root))
  }

  test("streamChanges tails a durable (autoSave) log as a file stream") {
    val root = java.nio.file.Files.createTempDirectory("graft_cdf_stream").toString
    try {
      val t = TrackedLake(spark, mkTable(), logRoot = Some(root),
        logBase = true, autoSave = true)
      spark.catalog.dropTempView("feedstream")
      val q = t.streamChanges().writeStream
        .format("memory").queryName("feedstream").outputMode("append").start()
      try {
        q.processAllAvailable()
        // base commit (3 rows) is already on disk and arrives in batch 0
        assert(spark.table("feedstream").count() == 3)
        // live mutations land as new cells and are discovered incrementally
        t.insert(Seq((4L, "b", 40.0)).toDF("k", "g", "v"))
        t.upsert(Seq((1L, "b", 11.0), (5L, "c", 50.0)).toDF("k", "g", "v"),
          Seq("k"))
        t.delete(Seq(2L).toDF("k"), Seq("k"))
        q.processAllAvailable()
        def rows(df: org.apache.spark.sql.DataFrame) = df
          .select("_seq", "_op", "k", "g", "v").collect()
          .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
            r.getString(3), r.getDouble(4))).toSet
        // the stream delivered exactly the feed's batch-read truth
        assert(rows(spark.table("feedstream")) == rows(t.changesSince(0L)))
        assert(spark.table("feedstream").count() == 3 + 1 + 3 + 1)
      } finally q.stop()
      // durability: a reopened feed continues from the persisted cells
      // with no manual save anywhere
      val t2 = TrackedLake(spark, mkTable(), logRoot = Some(root),
        autoSave = true)
      assert(t2.currentSeq == 4L)
      assert(t2.changesSince(0L).count() == 8)
    } finally LakeDataset.deleteRecursively(java.nio.file.Paths.get(root))
  }

  test("feed replication: streaming apply keeps a replica equal to the source") {
    val root = java.nio.file.Files.createTempDirectory("graft_cdf_repl").toString
    try {
      val t = TrackedLake(spark, mkTable(), logRoot = Some(root),
        logBase = true, autoSave = true)
      t.insert(Seq((4L, "c", 40.0)).toDF("k", "g", "v"))
      t.upsert(Seq((1L, "b", 11.0), (5L, "d", 50.0)).toDF("k", "g", "v"), Seq("k"))
      t.delete(Seq(2L).toDF("k"), Seq("k"))
      val replica = LakeDataset.fromDataFrame(spark,
        Seq.empty[(Long, String, Double)].toDF("k", "g", "v"))
      def follow() = t.streamChanges().writeStream
        .foreachBatch(graft.streaming.StreamingIngest
          .applyFeedBatches(replica, Seq("k")))
        .start()
      def snap(df: org.apache.spark.sql.DataFrame) =
        df.select("k", "g", "v").collect().map(r =>
          (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
      val q = follow()
      try q.processAllAvailable() finally q.stop()
      assert(snap(replica.toDF) == snap(t.table.toDF))
      // more mutations, then a FRESH query (no checkpoint) that replays the
      // whole log over the already-populated replica: the merge-based apply
      // is idempotent, so history replay cannot duplicate or corrupt
      t.upsert(Seq((4L, "c", 44.0)).toDF("k", "g", "v"), Seq("k"))
      t.delete(Seq(3L).toDF("k"), Seq("k"))
      val q2 = follow()
      try q2.processAllAvailable() finally q2.stop()
      assert(snap(replica.toDF) == snap(t.table.toDF))
    } finally LakeDataset.deleteRecursively(java.nio.file.Paths.get(root))
  }

  test("persisted log reopens and continues numbering; seq survives") {
    val root = java.nio.file.Files.createTempDirectory("graft_cdf").toString
    try {
      val table = mkTable()
      val t1 = TrackedLake(spark, table, logRoot = Some(root))
      t1.insert(Seq((4L, "b", 40.0)).toDF("k", "g", "v"))
      t1.log.toStorage()
      val t2 = TrackedLake(spark, table, logRoot = Some(root))
      assert(t2.currentSeq == 1L, s"reopened seq = ${t2.currentSeq}")
      t2.insert(Seq((5L, "b", 50.0)).toDF("k", "g", "v"))
      assert(t2.changesSince(0L).count() == 2)
      assert(t2.changesSince(1L).select("k").as[Long].collect().toSeq == Seq(5L))
    } finally LakeDataset.deleteRecursively(java.nio.file.Paths.get(root))
  }
}
