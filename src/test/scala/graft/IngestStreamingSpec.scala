package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.lake.{Database, Ingestor, LakeDataset}
import graft.model.TableName
import graft.streaming.StreamingIngest

class IngestStreamingSpec extends SparkSpec {
  import spark.implicits._

  test("ingestor buffers below threshold, flush applies the declared op (upsert)") {
    val ds = LakeDataset.fromDataFrame(spark,
      Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v"))
    var flushes = 0
    val ing = new Ingestor(ds, Some(Seq("k")), flushThresholdRows = 1000,
      onFlush = () => flushes += 1)
    ing.offer(Seq((1L, 11.0)).toDF("k", "v"), 1)
    ing.offer(Seq((3L, 30.0)).toDF("k", "v"), 1)
    assert(flushes == 0, "below threshold: nothing applied yet")
    assert(ds.toDF.count() == 2)
    ing.flush() // stream end — must apply UPSERT (not the reference's insert quirk)
    assert(flushes == 1)
    val got = ds.toDF.orderBy("k").as[(Long, Double)].collect().toSeq
    assert(got == Seq((1L, 11.0), (2L, 20.0), (3L, 30.0)))
  }

  test("drift gate: bootstrap admits, subsample admits, shifted batch quarantines whole") {
    import graft.streaming.StreamingIngest
    val empty = Seq.empty[(Long, Long)].toDF("id", "v")
    val main = LakeDataset.fromDataFrame(spark, empty)
    val quarantine = LakeDataset.fromDataFrame(spark, empty)
    val gate = StreamingIngest.driftGatedBatches(main, quarantine, "v",
      binWidth = 10L, nBins = 8, maxDevPerMille = 300L)
    // Bootstrap: the empty table has no distribution to drift from.
    val boot = (1L to 400L).map(i => (i, (i * 7) % 80)).toDF("id", "v")
    gate(boot, 0L)
    assert(main.toDF.count() == 400L && quarantine.toDF.count() == 0L)
    // A distribution-true subsample admits (same residue grid, new ids).
    val sub = (1L to 400L).filter(_ % 4 == 0).map(i => (i + 1000L, (i * 7) % 80)).toDF("id", "v")
    gate(sub, 1L)
    assert(main.toDF.count() == 500L && quarantine.toDF.count() == 0L)
    // A +60 shift clamps most mass into the top bin: TVD far over 30%.
    val shifted = (1L to 100L).map(i => (i + 2000L, (i * 7) % 80 + 60L)).toDF("id", "v")
    gate(shifted, 2L)
    assert(main.toDF.count() == 500L, "drifted batch must not reach the main table")
    assert(quarantine.toDF.count() == 100L, "drifted batch must be quarantined whole")
    // Empty batches are a no-op on both tables.
    gate(empty.toDF("id", "v"), 3L)
    assert(main.toDF.count() == 500L && quarantine.toDF.count() == 100L)
    // Threshold is validated eagerly.
    intercept[IllegalArgumentException] {
      StreamingIngest.driftGatedBatches(main, quarantine, "v", 10L, 8, 0L)
    }
  }

  test("erasure sink: each batch scrubs every surface; a replayed batch is a no-op") {
    import java.nio.file.Files
    import graft.operators.{ExactDedupIndex, MinhashIndex, Similarity, TextSearch}
    val d = Fixtures.table(spark, sf(), "documents")
      .filter(col("doc_id") < 200).select("doc_id", "text")
    val emb = Fixtures.table(spark, sf(), "embeddings")
      .filter(col("vec_id") < 200).select("vec_id", "embedding")
    val corpus = LakeDataset.fromDataFrame(spark,
      d.withColumn("b", (col("doc_id") % 4).cast("int")), partitionCols = Seq("b"))
    val ex = ExactDedupIndex.open(spark,
      Files.createTempDirectory("graft_ses_ex").toString, nBuckets = 4)
    ex.addBatch(d, "text", "doc_id")
    val bm = TextSearch.buildIndex(spark, d, "text", "doc_id", nBuckets = 4,
      storage = Some(graft.model.StorageSpec(
        Files.createTempDirectory("graft_ses_bm").toString)))
    val pos = TextSearch.buildPositional(spark, d, "text", "doc_id", nBuckets = 4,
      storage = Some(graft.model.StorageSpec(
        Files.createTempDirectory("graft_ses_pos").toString)))
    val mh = MinhashIndex.open(spark,
      Files.createTempDirectory("graft_ses_mh").toString, nBuckets = 4)
    mh.addBatch(d, "text", "doc_id")
    val ivfRoot = Files.createTempDirectory("graft_ses_ivf").toString
    val (cen, asg) = Similarity.buildIvf(emb, "embedding", "vec_id", 8, 16)
    Similarity.saveIvf(spark, ivfRoot, cen, asg)

    val (sink, current) = StreamingIngest.erasureBatches(
      corpus, "doc_id", ex, mh, bm, pos, ivfRoot)
    def state(): (Long, Long, Long, Long, Long, Long, Long) = (
      corpus.toDF.count(), ex.docRows.get.count(),
      current().postings.toDF.count(), pos.postings.toDF.count(),
      mh.bandRows.get.count(), mh.shingleRows.get.count(),
      Similarity.loadIvf(spark, ivfRoot).assigned.toDF.count())
    val before = state()
    val ids = Seq(0L, 50L, 150L).toDF("doc_id")
    sink(ids, 0L)
    val after = state()
    assert(after._1 == before._1 - 3, s"corpus: $before -> $after")
    assert(after._7 == before._7 - 3, "ivf lists must drop the erased vectors")
    assert(after._2 < before._2 && after._3 < before._3 &&
      after._4 < before._4 && after._5 < before._5 && after._6 < before._6,
      s"every index surface must shrink: $before -> $after")
    // nothing references the forgotten ids on any surface
    assert(corpus.toDF.filter(col("doc_id").isin(0L, 50L, 150L)).count() == 0)
    assert(current().postings.toDF.filter(col("doc").isin(0L, 50L, 150L)).count() == 0)
    assert(mh.bandRows.get.filter(col("doc").isin(0L, 50L, 150L)).count() == 0)
    // at-least-once transport: the SAME batch replayed changes nothing
    sink(ids, 1L)
    assert(state() === after, "replayed erase batch must be idempotent")
    // empty batches are a no-op
    sink(Seq.empty[Long].toDF("doc_id"), 2L)
    assert(state() === after)
  }

  test("interval join: cross-batch matches emit, out-of-window clicks never match") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 10:$m%02d:00").getTime * 1000L
    val memA = MemoryStream[(Long, Long)]
    val memB = MemoryStream[(Long, Long)]
    val joined = StreamingIngest.intervalJoin(
      memA.toDF().toDF("imp_id", "us_a")
        .select(col("imp_id"), timestamp_micros(col("us_a")).as("ts_a")),
      memB.toDF().toDF("clk_id", "us_b")
        .select(col("clk_id"), timestamp_micros(col("us_b")).as("ts_b")),
      "imp_id", "clk_id", "ts_a", "ts_b", "5 minutes", "10 minutes")
    val got = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    val q = joined.writeStream.foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
      got ++= b.select(col("imp_id"),
          ((unix_micros(col("ts_b")) - unix_micros(col("ts_a"))) / 60000000L).cast("long"))
        .as[(Long, Long)].collect()
      ()
    }.start()
    try {
      // impressions in batch 1
      memA.addData((1L, ts(0)), (2L, ts(0)), (3L, ts(0)))
      q.processAllAvailable()
      // clicks in batch 2: id 1 at +3min (match), id 2 at +7min (outside
      // the 5-minute window — must NOT match), id 3 exactly on the bound
      memB.addData((1L, ts(3)), (2L, ts(7)), (3L, ts(5)))
      q.processAllAvailable()
    } finally q.stop()
    assert(got.sorted.toSeq == Seq((1L, 3L), (3L, 5L)), s"got: $got")
  }

  test("leftOuter interval join: null-extend after watermark; late click stays dead") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 10:$m%02d:00").getTime * 1000L
    val memA = MemoryStream[(Long, Long)]
    val memB = MemoryStream[(Long, Long)]
    val joined = StreamingIngest.intervalJoin(
      memA.toDF().toDF("imp_id", "us_a")
        .select(col("imp_id"), timestamp_micros(col("us_a")).as("ts_a")),
      memB.toDF().toDF("clk_id", "us_b")
        .select(col("clk_id"), timestamp_micros(col("us_b")).as("ts_b")),
      "imp_id", "clk_id", "ts_a", "ts_b", "5 minutes", "10 minutes",
      joinType = "leftOuter")
    val got = scala.collection.mutable.ArrayBuffer[(Long, Boolean)]()
    val q = joined.writeStream.foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
      got ++= b.select(col("imp_id"), col("ts_b").isNotNull)
        .as[(Long, Boolean)].collect()
      ()
    }.start()
    try {
      memA.addData((1L, ts(0)), (2L, ts(0)))
      q.processAllAvailable()
      memB.addData((1L, ts(3)))          // imp 1 matches; imp 2 has no click
      q.processAllAvailable()
      assert(got.toSet == Set((1L, true)),
        s"imp 2 must NOT null-extend before the watermark proves it: $got")
      // watermark flush: first sentinel advances it, second runs a batch
      // under it so the evicted unmatched row emits
      memA.addData((-1L, ts(0) + 86400000000L)); memB.addData((-1L, ts(0) + 86400000000L))
      q.processAllAvailable()
      memA.addData((-2L, ts(0) + 2 * 86400000000L)); memB.addData((-2L, ts(0) + 2 * 86400000000L))
      q.processAllAvailable()
      assert(got.filter(_._1 == 2L).toSeq == Seq((2L, false)),
        s"imp 2 must null-extend exactly once after the flush: $got")
      // a LATE click for imp 2 (event time long past the watermark) must
      // not resurrect it — the row already null-extended
      memB.addData((2L, ts(4)))
      q.processAllAvailable()
      assert(got.count(_._1 == 2L) == 1, s"late click resurrected imp 2: $got")
    } finally q.stop()
  }

  test("join-output micro-batches retained by a lake stay readable after the stream") {
    // Regression: localCheckpoint copies the micro-batch plan's constraints
    // (watermark-tagged attributes) onto the LogicalRDD; a later Union
    // constraint rewrite over the retained snapshot died with
    // `key not found: ts_a#N` until Bridge.severCheckpoint dropped them.
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 10:$m%02d:00").getTime * 1000L
    val memA = MemoryStream[(Long, Long)]
    val memB = MemoryStream[(Long, Long)]
    val joined = StreamingIngest.intervalJoin(
      memA.toDF().toDF("imp_id", "us_a")
        .select(col("imp_id"), timestamp_micros(col("us_a")).as("ts_a")),
      memB.toDF().toDF("clk_id", "us_b")
        .select(col("clk_id"), timestamp_micros(col("us_b")).as("ts_b")),
      "imp_id", "clk_id", "ts_a", "ts_b", "5 minutes", "10 minutes")
    val ds = LakeDataset.fromDataFrame(spark,
      Seq((0L, java.sql.Timestamp.valueOf("2026-01-01 09:00:00"),
        java.sql.Timestamp.valueOf("2026-01-01 09:01:00")))
        .toDF("imp_id", "ts_a", "ts_b"))
    val q = joined.writeStream.foreachBatch(
      (b: org.apache.spark.sql.DataFrame, _: Long) =>
        ds.insert(b.select("imp_id", "ts_a", "ts_b"))).start()
    try {
      memA.addData((1L, ts(0)), (2L, ts(0)))
      q.processAllAvailable()
      memB.addData((1L, ts(3)), (2L, ts(7)))
      q.processAllAvailable()
    } finally q.stop()
    // the union view must survive a constraint-bearing query (join + agg)
    val n = ds.toDF.join(Seq(1L, 2L).toDF("imp_id"), "imp_id")
      .groupBy("imp_id").count().count()
    assert(n == 1L, s"expected only imp 1 joined, got $n groups")
  }

  test("ingestor auto-flushes when buffered rows cross the threshold") {
    val ds = LakeDataset.fromDataFrame(spark, Seq((1L, 1.0)).toDF("k", "v"))
    val ing = new Ingestor(ds, None, flushThresholdRows = 3)
    ing.offer(Seq((2L, 2.0), (3L, 3.0)).toDF("k", "v"), 2)
    assert(ds.toDF.count() == 1)
    ing.offer(Seq((4L, 4.0)).toDF("k", "v"), 1) // 3 rows buffered -> flush
    assert(ds.toDF.count() == 4)
  }

  test("exactly-once insert: epoch cells commit once, replays overwrite, tears heal") {
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_eo").toString
    val ds = LakeDataset.forStorage(spark,
      partitionCols = Seq(StreamingIngest.EpochCol), bucketCols = Nil,
      nBuckets = 1, bloomCols = Nil, storage = graft.model.StorageSpec(root))
    val sink = StreamingIngest.exactlyOnceInsert(ds)

    val mem = MemoryStream[(Long, Double)]
    val q = mem.toDF().toDF("k", "v").writeStream.foreachBatch(sink).start()
    try {
      mem.addData((1L, 1.0), (2L, 2.0))
      q.processAllAvailable()
      mem.addData((3L, 3.0))
      q.processAllAvailable()
    } finally q.stop()
    assert(ds.toDF.count() == 3)

    // Redelivery of an already-committed epoch (crash after sink, before
    // checkpoint commit): the same batch content re-applies — OVERWRITE,
    // not duplicate.
    sink(Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v"), 0L)
    assert(ds.toDF.count() == 3, "replayed epoch must not duplicate")

    // Torn cell from a crash MID-write: junk files under the epoch dir the
    // catalog never admitted. The replay wipes the subtree before
    // rewriting — skip-if-present would have frozen the tear.
    val torn = java.nio.file.Paths.get(root,
      s"${StreamingIngest.EpochCol}=2")
    Seq((99L, 99.0)).toDF("k", "v").write.mode("append")
      .parquet(torn.toString)
    sink(Seq((4L, 4.0)).toDF("k", "v"), 2L)
    assert(ds.toDF.count() == 4)
    assert(ds.toDF.filter(col("k") === 99L).count() == 0, "tear healed")

    // The result is durable and clean on a fresh load.
    val back = LakeDataset.fromStorage(spark, root)
    assert(back.toDF.count() == 4)
    assert(back.toDF.select("k").as[Long].collect().toSet == Set(1L, 2L, 3L, 4L))
  }

  test("streamed append-only ingest keeps metadata count+sum answerable") {
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_eo_sum").toString
    val ds = LakeDataset.forStorage(spark,
      partitionCols = Seq(StreamingIngest.EpochCol), bucketCols = Nil,
      nBuckets = 1, bloomCols = Nil, storage = graft.model.StorageSpec(root))
    val sink = StreamingIngest.exactlyOnceInsert(ds)
    val mem = MemoryStream[(Long, Long)]
    val q = mem.toDF().toDF("k", "x").writeStream.foreachBatch(sink).start()
    try {
      mem.addData((1L, 10L), (2L, 20L))
      q.processAllAvailable()
      mem.addData((3L, 12L), (4L, 5L))
      q.processAllAvailable()
    } finally q.stop()
    // Every micro-batch landed as a fresh tight cell (insertWritten) — the
    // dashboard count+sum answers from the catalog over the LIVE table,
    // and after a fresh load from the manifest alone.
    import graft.operators.Stats
    assert(Stats.sumAnswerable(ds, Seq("x")))
    assert(Stats.tableSumStats(spark, ds, Seq("x")).head().toSeq ==
      Seq(4L, 47L))
    val back = LakeDataset.fromStorage(spark, root)
    assert(Stats.sumAnswerable(back, Seq("x")))
    assert(Stats.tableSumStats(spark, back, Seq("x")).head().toSeq ==
      Seq(4L, 47L))
  }

  test("structured streaming foreachBatch upserts micro-batches into the lake") {
    implicit val sqlCtx = spark.sqlContext
    val ds = LakeDataset.fromDataFrame(spark,
      Seq((1L, "init", 0.0), (2L, "init", 0.0)).toDF("k", "tag", "v"))
    val db = new Database(spark)
    db.register(TableName("public", "stream_t"), ds)

    val mem = MemoryStream[(Long, String, Double)]
    val q = mem.toDF().toDF("k", "tag", "v").writeStream
      .foreachBatch(StreamingIngest.upsertBatches(ds, Seq("k"), Some(db -> "stream_t")))
      .start()
    try {
      mem.addData((1L, "b1", 1.0), (3L, "b1", 3.0))
      q.processAllAvailable()
      mem.addData((1L, "b2", 10.0))
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.sql("SELECT k, tag, v FROM stream_t ORDER BY k")
      .as[(Long, String, Double)].collect().toSeq
    assert(got == Seq((1L, "b2", 10.0), (2L, "init", 0.0), (3L, "b1", 3.0)))
  }

  test("streamInsertSink maintains registered SQL materialized views per batch") {
    implicit val sqlCtx = spark.sqlContext
    val ds = LakeDataset.fromDataFrame(spark,
      Seq(("a", 1.0), ("b", 2.0)).toDF("g", "v"))
    val db = new Database(spark)
    db.register(TableName("public", "smv_t"), ds)
    db.executeDml(
      """CREATE MATERIALIZED VIEW smv_v AS
        |SELECT g, COUNT(*) AS n, SUM(v) AS total FROM smv_t GROUP BY g""".stripMargin)

    val mem = MemoryStream[(String, Double)]
    val q = mem.toDF().toDF("g", "v").writeStream
      .foreachBatch(db.streamInsertSink("smv_t"))
      .start()
    try {
      mem.addData(("a", 10.0), ("c", 5.0))
      q.processAllAvailable()
      mem.addData(("c", 1.5), ("b", 0.25))
      q.processAllAvailable()
    } finally q.stop()

    // The MV answered FROM ITS STATE (no base rescan) equals the one-shot
    // group-by over everything the stream delivered (double SUMs maintain
    // as exact decimals — compare through the same cast).
    val got = spark.sql("SELECT g, n, total FROM smv_v ORDER BY g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDecimal(2))).toSeq
    val want = spark.sql(
      """SELECT g, COUNT(*) AS n, SUM(CAST(v AS DECIMAL(38,2))) AS total
        |FROM smv_t GROUP BY g ORDER BY g""".stripMargin).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDecimal(2))).toSeq
    assert(got == want)
    assert(got.map(_._1) == Seq("a", "b", "c"))
    assert(got.find(_._1 == "c").get._2 == 2L)
  }

  test("streamUpsertSink maintains MVs with targeted group refresh per CDC batch") {
    implicit val sqlCtx = spark.sqlContext
    val ds = LakeDataset.fromDataFrame(spark,
      Seq((1L, "a", 1.0), (2L, "a", 2.0), (3L, "b", 30.0)).toDF("k", "g", "v"))
    val db = new Database(spark)
    db.register(TableName("public", "suv_t"), ds)
    db.executeDml(
      """CREATE MATERIALIZED VIEW suv_v AS
        |SELECT g, COUNT(*) AS n, MAX(v) AS mx FROM suv_t GROUP BY g""".stripMargin)

    val mem = MemoryStream[(Long, String, Double)]
    val q = mem.toDF().toDF("k", "g", "v").writeStream
      .foreachBatch(db.streamUpsertSink("suv_t", Seq("k")))
      .start()
    try {
      // Batch 1: update k=1 in place, insert k=4 into a NEW group.
      mem.addData((1L, "a", 10.0), (4L, "c", 4.0))
      q.processAllAvailable()
      // Batch 2: MOVE k=3 from group b to group a (vacated + receiving
      // groups must both refresh) and lower a max.
      mem.addData((3L, "a", 0.5))
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.sql("SELECT g, n, mx FROM suv_v ORDER BY g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    val want = spark.sql(
      "SELECT g, COUNT(*) AS n, MAX(v) AS mx FROM suv_t GROUP BY g ORDER BY g")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == want)
    // Group b vanished (its only row moved out); group a max reflects the
    // in-place update, not the moved row's old value.
    assert(got.map(_._1) == Seq("a", "c"))
    assert(got.head._3 == 10.0)
  }

  test("streaming IVF maintenance self-heals: monitor fires, index heals, monitor quiet") {
    import graft.operators.Similarity
    implicit val sqlCtx = spark.sqlContext
    val e = spark.read.parquet(s"${sf()}/embeddings.parquet")
      .select("vec_id", "embedding")
    val held = e.filter(col("vec_id") < 5)
    val rest = e.filter(col("vec_id") >= 5)
    val (centroids, assigned) = Similarity.buildIvf(rest, "embedding", "vec_id", 8, 64)
    val root = java.nio.file.Files.createTempDirectory("graft_ivf_stream").toString
    Similarity.saveIvf(spark, root, centroids, assigned)
    val index = Similarity.loadIvf(spark, root)

    var heals = 0
    val (sink, current) = StreamingIngest.ivfBatches(root, index,
      "embedding", "vec_id", onHeal = _ => heals += 1)

    val heldRows = held.as[(Long, Seq[Float])].collect().toSeq
    // Near-but-DISTINCT drift pile aimed at one centroid (identical vectors
    // are cosine-inseparable — no split could succeed on them).
    val hot = e.limit(1).head().getSeq[Float](1)
    val pile = (0 until 3000).map { i =>
      (1000000L + i, hot.updated(0, hot(0) + (i % 97) / 50.0f): Seq[Float])
    }

    val mem = MemoryStream[(Long, Seq[Float])]
    val q = mem.toDF().toDF("vec_id", "embedding").writeStream
      .foreachBatch(sink).start()
    try {
      // Benign micro-batch: routes to existing lists, no heal.
      mem.addData(heldRows: _*)
      q.processAllAvailable()
      assert(heals == 0 && current().centroids == centroids)
      assert(!Similarity.needsRecluster(current()))
      // Drifting micro-batch: skews one list past the monitor — the sink
      // must heal in the SAME batch, no operator in the loop.
      mem.addData(pile: _*)
      q.processAllAvailable()
      assert(heals == 1, "drift batch must trigger exactly one heal")
      assert(!Similarity.needsRecluster(current()), "monitor must stand down")
      assert(current().centroids.size > centroids.size, "overflow list split")
    } finally q.stop()

    // The healed handle is LIVE: probing every list reproduces the exact
    // top-k over everything ever streamed — heal moved rows, lost none.
    val pileDf = pile.toDF("vec_id", "embedding")
    val full = rest.unionByName(held).unionByName(pileDf)
    val qv = e.filter(col("vec_id") === 3).head().getSeq[Float](1).toSeq
    val exact = Similarity.exactTopKQuantized(full, "embedding", "vec_id", qv, 10)
      .as[(Long, Long)].collect().toSeq
    val healed = current()
    val allProbe = Similarity.ivfTopKLake(healed, "embedding", "vec_id", qv, 10,
      nprobe = healed.centroids.size, quantize = true).as[(Long, Long)].collect().toSeq
    assert(allProbe == exact)
    // And the heal persisted: a fresh load sees the post-split layout.
    assert(Similarity.loadIvf(spark, root).centroids == healed.centroids)
  }

  test("windowed aggregation with watermark over the events table (batch run)") {
    val ev = Fixtures.table(spark, sf(), "events")
    val agg = StreamingIngest.windowedAgg(ev, "ts", "value", "event_type",
      windowLen = "1 hour", watermark = "2 hours")
    val n = agg.agg(sum("n")).head().getLong(0)
    assert(n == ev.count(), "window totals must cover every event")
  }

  test("stateful sessionization carries state across micro-batches") {
    import graft.streaming.StreamingIngest.{SessionEvent, SessionUpdate}
    implicit val sqlCtx = spark.sqlContext
    val min = 60L * 1000000L
    val mem = MemoryStream[SessionEvent]
    val q = StreamingIngest.sessionize(mem.toDS(), gapMinutes = 30)
      .writeStream.outputMode("update").format("memory").queryName("sessions").start()
    try {
      // batch 1: user 1 -> two events 10 min apart (one session)
      mem.addData(SessionEvent(1L, 0L), SessionEvent(1L, 10 * min))
      q.processAllAvailable()
      // batch 2: user 1 -> 40 min later (new session); user 2 first event
      mem.addData(SessionEvent(1L, 50 * min), SessionEvent(2L, 0L))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.sql("SELECT user_id, sessions, events FROM sessions")
      .as[(Long, Long, Long)].collect().groupBy(_._1).map { case (u, rows) =>
        u -> rows.maxBy(_._3) // latest update per user
      }
    assert(got(1L) == ((1L, 2L, 3L)), s"user 1: $got")
    assert(got(2L) == ((2L, 1L, 1L)), s"user 2: $got")
  }

  test("flatMapGroupsWithState emits closed sessions in append mode") {
    import graft.streaming.StreamingIngest.{ClosedSession, SessionEvent}
    implicit val sqlCtx = spark.sqlContext
    val min = 60L * 1000000L
    val mem = MemoryStream[SessionEvent]
    val q = StreamingIngest.closedSessions(mem.toDS(), gapMinutes = 30)
      .writeStream.outputMode("append").format("memory").queryName("closed").start()
    try {
      mem.addData(SessionEvent(1L, 0L), SessionEvent(1L, 10 * min))
      q.processAllAvailable() // session still open -> nothing emitted
      assert(spark.sql("SELECT * FROM closed").count() == 0)
      mem.addData(SessionEvent(1L, 50 * min)) // gap 40min closes it
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.sql("SELECT user_id, start_us, end_us, n_events FROM closed")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 0L, 10 * min, 2L)))
  }

  test("bounded sessions: watermark timeout evicts and emits stale state") {
    import graft.streaming.StreamingIngest.SessionEvent
    implicit val sqlCtx = spark.sqlContext
    val min = 60L * 1000000L
    val mem = MemoryStream[SessionEvent]
    val q = StreamingIngest.closedSessionsBounded(mem.toDS(), gapMinutes = 30,
        watermarkDelay = "1 hour")
      .writeStream.outputMode("append").format("memory").queryName("bounded").start()
    // Keep clear of epoch 0: the initial watermark is 0 and an event AT it
    // would be dropped as late.
    val t0 = 10000 * min
    try {
      // batch 1: user 1, two events -> open session, timeout armed at +30min
      mem.addData(SessionEvent(1L, t0), SessionEvent(1L, t0 + 10 * min))
      q.processAllAvailable()
      assert(spark.sql("SELECT * FROM bounded").count() == 0)
      // batch 2: user 2 far in the future -> watermark jumps to t0+2h
      mem.addData(SessionEvent(2L, t0 + 180 * min))
      q.processAllAvailable()
      // batch 3: any trigger after the watermark update fires user 1's
      // timeout: the session emits WITHOUT any further user-1 event.
      mem.addData(SessionEvent(3L, t0 + 181 * min))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.sql("SELECT user_id, start_us, end_us, n_events FROM bounded")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, t0, t0 + 10 * min, 2L)), s"got $got")
  }

  test("executeSqls dedupes identical statements and runs concurrently") {
    implicit val ec = scala.concurrent.ExecutionContext.global
    val db = new Database(spark)
    db.register(TableName("public", "sqls_t"),
      LakeDataset.fromDataFrame(spark, Seq((1L, "x"), (2L, "y")).toDF("k", "s")))
    val res = db.executeSqls(Seq(
      "SELECT COUNT(*) AS n FROM sqls_t",
      "SELECT COUNT(*) AS n FROM sqls_t",
      "SELECT MAX(k) AS m FROM sqls_t"))
    assert(res.size == 2)
    assert(res("SELECT COUNT(*) AS n FROM sqls_t").head.getLong(0) == 2L)
    assert(res("SELECT MAX(k) AS m FROM sqls_t").head.getLong(0) == 2L)
  }

  test("watermark dedup: within-horizon replays drop, state stays bounded") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp, String)]
    def ts(min: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 10:$min%02d:00")
    val deduped = StreamingIngest.dedupWithinWatermark(
      mem.toDF().toDF("doc_id", "ts", "text"), Seq("doc_id"), "ts",
      watermark = "10 minutes")
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    val sink: (org.apache.spark.sql.DataFrame, Long) => Unit = (b, _) =>
      seen ++= b.select("doc_id", "text").as[(Long, String)].collect()
    val q = deduped.writeStream.foreachBatch(sink).start()
    try {
      mem.addData((1L, ts(0), "a"), (2L, ts(1), "b"))
      q.processAllAvailable()
      // replay doc 1 within the watermark horizon + one fresh doc
      mem.addData((1L, ts(2), "a"), (3L, ts(3), "c"))
      q.processAllAvailable()
      // duplicate INSIDE one batch dedups too
      mem.addData((4L, ts(4), "d"), (4L, ts(4), "d"))
      q.processAllAvailable()
    } finally q.stop()
    assert(seen.sorted == Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")),
      s"each key exactly once: $seen")
  }

  test("anomalyFlags: stream flags equal the batch operator across epochs") {
    import graft.streaming.StreamingIngest.{AnomalyFlag, SeriesPoint}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rnd = new scala.util.Random(17)
    val pts = (for (k <- 1L to 3L; t <- 1 to 30) yield
      SeriesPoint(k, t.toLong * 1000000L, rnd.nextLong() % 1000L)).toSeq
    val mem = MemoryStream[SeriesPoint]
    val got = scala.collection.mutable.ArrayBuffer.empty[AnomalyFlag]
    val q = StreamingIngest.anomalyFlags(mem.toDS(), window = 4, kNum = 3, kDen = 2)
      .writeStream.outputMode("append").foreachBatch(
        (b: org.apache.spark.sql.Dataset[AnomalyFlag], _: Long) =>
          { got ++= b.collect(); () }).start()
    try {
      val sorted = pts.sortBy(_.ts_us)
      val (h1, h2) = sorted.splitAt(sorted.length / 2)
      mem.addData(h1: _*); q.processAllAvailable()
      mem.addData(h2: _*); q.processAllAvailable()
    } finally q.stop()
    val want = graft.operators.TimeSeries.anomalies(
        pts.map(p => (p.key, p.ts_us, p.v)).toDF("k", "t", "v"),
        "k", "t", "v", window = 4, kNum = 3, kDen = 2)
      .select($"k", $"t", $"v", $"anomaly")
      .as[(Long, Long, Long, Option[Boolean])].collect()
      .map(r => AnomalyFlag(r._1, r._2, r._3, r._4)).toSet
    assert(got.size == want.size && got.toSet == want)
    // the first `window` points of each key carry the don't-know NULL
    assert(got.count(_.anomaly.isEmpty) == 3 * 4)
  }

  test("anomalyFlags: out-of-order arrival refuses loudly, never flags wrong") {
    import graft.streaming.StreamingIngest.{AnomalyFlag, SeriesPoint}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[SeriesPoint]
    val q = StreamingIngest.anomalyFlags(mem.toDS(), window = 2)
      .writeStream.outputMode("append").foreachBatch(
        (b: org.apache.spark.sql.Dataset[AnomalyFlag], _: Long) =>
          { b.count(); () }).start()
    try {
      mem.addData(SeriesPoint(1L, 100L, 1L))
      q.processAllAvailable()
      mem.addData(SeriesPoint(1L, 50L, 2L))
      val e = intercept[Exception] { q.processAllAvailable() }
      def chain(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x => x.getMessage +: chain(x.getCause))
      assert(chain(e).exists(m => m != null && m.contains("monotone")),
        chain(e).mkString(" | "))
    } finally q.stop()
  }
}
