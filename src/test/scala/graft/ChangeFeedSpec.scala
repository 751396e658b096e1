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
