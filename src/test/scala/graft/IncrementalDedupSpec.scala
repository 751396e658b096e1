package graft

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, ExactDedupIndex, MinhashIndex}

/** Incremental MinHash index vs the full recompute: the union of per-batch
  * pair sets must EQUAL minhashDedup over the whole corpus (same hashes,
  * banding, verify), and the persisted state must survive a reopen.
  */
class IncrementalDedupSpec extends SparkSpec {
  import spark.implicits._

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
    df.select("doc_a", "doc_b", "jaccard").as[(Long, Long, Double)].collect().toSet

  test("batched ingest reproduces the full-recompute pair set exactly") {
    val corpus = Fixtures.nearDupDocuments(spark, sf())
    val full = pairs(Dedup.minhashDedup(corpus, "text", "doc_id", threshold = 0.5))
    assert(full.nonEmpty, "fixture must contain planted near-dups")

    val root = Files.createTempDirectory("graft_mh_idx").toString
    val idx = MinhashIndex.open(spark, root)
    val b0 = corpus.filter(col("doc_id") < 200)
    val b1 = corpus.filter(col("doc_id") >= 200 && col("doc_id") < 100000)
    val b2 = corpus.filter(col("doc_id") >= 100000)
    val incremental =
      pairs(idx.addBatch(b0, "text", "doc_id", threshold = 0.5)) ++
      pairs(idx.addBatch(b1, "text", "doc_id", threshold = 0.5)) ++
      pairs(idx.addBatch(b2, "text", "doc_id", threshold = 0.5))
    assert(incremental == full)
    assert(idx.batches == 3)
  }

  test("index persists: a reopened session sees prior batches' documents") {
    val corpus = Fixtures.nearDupDocuments(spark, sf())
    val root = Files.createTempDirectory("graft_mh_idx2").toString

    val first = MinhashIndex.open(spark, root)
    first.addBatch(corpus.filter(col("doc_id") < 100000), "text", "doc_id",
      threshold = 0.5)

    // New handle, fresh state read from disk: batch numbering continues and
    // the near-dup copies must pair with ORIGINALS ingested by `first`.
    val reopened = MinhashIndex.open(spark, root)
    assert(reopened.batches == 1)
    val p = pairs(reopened.addBatch(
      corpus.filter(col("doc_id") >= 100000), "text", "doc_id", threshold = 0.5))
    assert(reopened.batches == 2)
    val crossBatch = p.filter { case (a, b, _) => a < 100000 && b >= 100000 }
    assert(crossBatch.nonEmpty, "cross-batch pairs must come from persisted state")
    // planted pairs: every 10th doc has a near-dup copy at id+100000
    assert(crossBatch.exists { case (a, b, _) => b == a + 100000 })
  }

  test("streaming near-dup maintenance: micro-batches through the index find cross-batch pairs") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val corpus = Fixtures.nearDupDocuments(spark, sf())
    val root = Files.createTempDirectory("graft_mh_stream").toString
    val idx = MinhashIndex.open(spark, root)
    val collected = scala.collection.mutable.Set[(Long, Long)]()

    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text").writeStream
      .outputMode("append")
      .foreachBatch(graft.streaming.StreamingIngest.dedupBatches(
        idx, "text", "doc_id", threshold = 0.5,
        onPairs = p => collected ++=
          p.select("doc_a", "doc_b").as[(Long, Long)].collect()))
      .start()
    try {
      val docs = corpus.select("doc_id", "text").as[(Long, String)].collect()
      mem.addData(docs.filter(_._1 < 100000).toSeq: _*)
      q.processAllAvailable()
      val afterFirst = collected.size
      mem.addData(docs.filter(_._1 >= 100000).toSeq: _*)
      q.processAllAvailable()
      // planted pairs span the two micro-batches — only the persisted index
      // state can produce them
      val planted = collected.count { case (a, b) => b == a + 100000 }
      assert(planted >= 45, s"found $planted of 50 planted cross-batch pairs")
      assert(idx.batches == 2)
      assert(afterFirst < collected.size)
    } finally q.stop()
  }

  test("reopening with mismatched hash parameters is refused") {
    val root = Files.createTempDirectory("graft_mh_params").toString
    val idx = MinhashIndex.open(spark, root)
    idx.addBatch(Fixtures.nearDupDocuments(spark, sf()).limit(20), "text", "doc_id")
    // same params reopen fine; different params must throw, not mix spaces
    MinhashIndex.open(spark, root)
    intercept[IllegalArgumentException] {
      MinhashIndex.open(spark, root, numHashes = 64, bands = 16)
    }
  }

  test("exact index: batched new-unique sets equal the one-shot normalized dedup") {
    val corpus = Fixtures.table(spark, sf(), "documents").select("doc_id", "text")
    val root = Files.createTempDirectory("graft_ex_idx").toString
    val idx = ExactDedupIndex.open(spark, root)
    val b1 = corpus.filter(col("doc_id") < 200)
    // Batch 2 re-ingests noisy copies of some batch-1 docs plus fresh docs.
    val noisy = b1.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 50000).as("doc_id"),
        concat(upper(col("text")), lit(" ??")).as("text"))
    val b2 = corpus.filter(col("doc_id") >= 200).unionByName(noisy)
    val r1 = idx.addBatch(b1, "text", "doc_id").select("doc").as[Long].collect().toSet
    val r2 = idx.addBatch(b2, "text", "doc_id").select("doc").as[Long].collect().toSet
    assert(idx.batches == 2)
    assert(r2.forall(_ >= 200), "no batch-2 noisy copy may count as new")
    assert((r1 & r2).isEmpty)
    // Union of per-batch new-uniques == one-shot normalized canonicals over
    // the full corpus (batch-1 ids win ties because they ingested first and
    // are smaller).
    val oneShot = Dedup.exactNormalized(b1.unionByName(b2), "text", "doc_id")
      .select("canonical_id").as[Long].collect().toSet
    assert((r1 ++ r2) == oneShot)
    // Reopen: persisted state still refuses previously seen content, and
    // mismatched key-space parameters are refused outright.
    val reopened = ExactDedupIndex.open(spark, root)
    assert(reopened.batches == 2)
    val r3 = reopened.addBatch(
      b1.limit(20).withColumn("doc_id", col("doc_id") + 90000), "text", "doc_id")
    assert(r3.count() == 0, "re-ingest of seen content must return nothing")
    intercept[IllegalArgumentException] {
      ExactDedupIndex.open(spark, root, normalized = false)
    }
  }

  test("streaming exact-dedup maintenance: cross-batch repeats filtered, index self-compacts") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val corpus = Fixtures.table(spark, sf(), "documents").select("doc_id", "text")
    val root = Files.createTempDirectory("graft_ex_stream").toString
    val idx = ExactDedupIndex.open(spark, root, nBuckets = 8)
    val fresh = scala.collection.mutable.Set[Long]()

    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text").writeStream
      .outputMode("append")
      .foreachBatch(graft.streaming.StreamingIngest.exactDedupBatches(
        idx, "text", "doc_id", compactEvery = 1,
        onFresh = f => fresh ++= f.select("doc").as[Long].collect()))
      .start()
    try {
      val docs = corpus.as[(Long, String)].collect()
      mem.addData(docs.filter(_._1 < 250).toSeq: _*)
      q.processAllAvailable()
      // Second micro-batch re-sends noisy copies of first-batch docs plus
      // genuinely new ones — only the new ones may come through.
      val noisy = docs.filter(t => t._1 < 250 && t._1 % 5 == 0)
        .map { case (id, t) => (id + 80000L, t.toUpperCase + "  !") }
      mem.addData((docs.filter(_._1 >= 250) ++ noisy).toSeq: _*)
      q.processAllAvailable()
      assert(fresh.forall(_ < 80000L), "no noisy cross-batch repeat may pass")
      val oneShot = Dedup.exactNormalized(corpus, "text", "doc_id")
        .select("canonical_id").as[Long].collect().toSet
      assert(fresh.toSet == oneShot)
      // compactEvery=1 folded after each micro-batch: cells stay O(nBuckets)
      assert(idx.docRows.get.inputFiles.length <= 8,
        "self-compaction must keep the folded cell count bounded")
    } finally q.stop()
  }

  test("exact index compaction folds batches without changing any answer") {
    val corpus = Fixtures.table(spark, sf(), "documents").select("doc_id", "text")
    val root = Files.createTempDirectory("graft_ex_cp").toString
    val idx = ExactDedupIndex.open(spark, root, nBuckets = 8)
    val b1 = corpus.filter(col("doc_id") < 150)
    val b2 = corpus.filter(col("doc_id") >= 150 && col("doc_id") < 300)
    val b3 = corpus.filter(col("doc_id") >= 300)
    val r1 = idx.addBatch(b1, "text", "doc_id").select("doc").as[Long].collect().toSet
    val r2 = idx.addBatch(b2, "text", "doc_id").select("doc").as[Long].collect().toSet
    val rowsBefore = idx.docRows.get.count()
    idx.compact()
    assert(idx.batches == 3, "the fold consumes one batch number")
    assert(idx.docRows.get.count() == rowsBefore, "folding must not add or drop rows")
    // Seen content (noisy, folded away by normalization) is still refused.
    val noisy = b1.limit(30)
      .select((col("doc_id") + 70000).as("doc_id"),
        concat(upper(col("text")), lit("  .")).as("text"))
    assert(idx.addBatch(noisy, "text", "doc_id").count() == 0)
    // Numbering continues past the fold and later batches dedup against
    // the folded corpus — union of new-uniques still equals the one-shot.
    val r3 = idx.addBatch(b3, "text", "doc_id").select("doc").as[Long].collect().toSet
    val oneShot = Dedup.exactNormalized(corpus, "text", "doc_id")
      .select("canonical_id").as[Long].collect().toSet
    assert((r1 ++ r2 ++ r3) == oneShot)
    // Crash window: an original batch dir the interrupted deletion left
    // behind is finished off on open (its folded copy IS committed).
    val reopened0 = ExactDedupIndex.open(spark, root, nBuckets = 8)
    val total = reopened0.docRows.get.count()
    val foldDir = java.nio.file.Paths.get(s"$root/docs/batch=2")
    Fixtures.copyDir(foldDir.toString, s"$root/docs/batch=0")
    val reopened = ExactDedupIndex.open(spark, root, nBuckets = 8)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$root/docs/batch=0")))
    assert(reopened.docRows.get.count() == total)
  }

  test("a failed sibling write rolls the batch back; the same batch retries cleanly") {
    val corpus = Fixtures.nearDupDocuments(spark, sf()).filter(col("doc_id") < 300)
    val root = Files.createTempDirectory("graft_mh_rb").toString
    val idx = MinhashIndex.open(spark, root)
    // Plant a regular FILE where the pairs directory tree must go: the
    // pairs write fails while the two table appends race ahead — the
    // failure path must then UNREGISTER whatever its siblings committed,
    // or the live index serves rows the commit marker never covers.
    Files.write(java.nio.file.Paths.get(root, "pairs"), Array[Byte](1))
    intercept[Exception] { idx.addBatch(corpus, "text", "doc_id", threshold = 0.5) }
    assert(idx.batches == 0)
    // dropParts removes the leaf bucket cells (an empty batch=0 shell may
    // remain — discovery ignores dirs without data files): assert no DATA
    // survived the rollback.
    for (t <- Seq("shingles", "bands")) {
      val dir = java.nio.file.Paths.get(root, t, "batch=0")
      val files =
        if (!Files.isDirectory(dir)) Nil
        else {
          val s = Files.walk(dir)
          try s.iterator().asScala.filter(p =>
            Files.isRegularFile(p) && p.getFileName.toString.endsWith(".parquet")).toList
          finally s.close()
        }
      assert(files.isEmpty, s"$t/batch=0 data survived the rollback: $files")
    }
    // Same process, same batch number: the retry must not collide with a
    // leftover registration and must produce the full pair set.
    Files.delete(java.nio.file.Paths.get(root, "pairs"))
    val expected = pairs(Dedup.minhashDedup(corpus, "text", "doc_id", threshold = 0.5))
    assert(pairs(idx.addBatch(corpus, "text", "doc_id", threshold = 0.5)) == expected)
    assert(idx.batches == 1)
  }

  test("a batch half-saved by a crash is dropped and re-ingested on open") {
    val corpus = Fixtures.nearDupDocuments(spark, sf())
    val root = Files.createTempDirectory("graft_mh_crash").toString
    val idx = MinhashIndex.open(spark, root)
    idx.addBatch(corpus.filter(col("doc_id") < 100000), "text", "doc_id",
      threshold = 0.5)
    val expected = pairs(idx.addBatch(
      corpus.filter(col("doc_id") >= 100000), "text", "doc_id", threshold = 0.5))

    // Simulate a crash between batch 1's shingle save and band save: the
    // commit marker still says one batch, shingles/batch=1 is on disk,
    // bands/batch=1 is not.
    Files.writeString(java.nio.file.Paths.get(s"$root/params.json"),
      """{"numHashes":32,"bands":8,"shingleSize":3,"nBuckets":32,"batches":1}""")
    graft.lake.LakeDataset.deleteRecursively(
      java.nio.file.Paths.get(s"$root/bands/batch=1"))

    val reopened = MinhashIndex.open(spark, root)
    assert(reopened.batches == 1)
    // The stale shingle rows must be gone BEFORE the replay — keeping them
    // would double batch 1's (doc, h) rows and inflate every Jaccard.
    assert(!Files.exists(java.nio.file.Paths.get(s"$root/shingles/batch=1")))
    val replayed = pairs(reopened.addBatch(
      corpus.filter(col("doc_id") >= 100000), "text", "doc_id", threshold = 0.5))
    assert(replayed == expected)
    assert(replayed.forall(_._3 <= 1.0))
  }

  test("per-batch work scales with the batch: second batch signs only new docs") {
    val corpus = Fixtures.nearDupDocuments(spark, sf())
    val root = Files.createTempDirectory("graft_mh_idx3").toString
    val idx = MinhashIndex.open(spark, root)
    idx.addBatch(corpus.filter(col("doc_id") < 100000), "text", "doc_id")
    // the persisted band table holds one batch=0 directory; adding a tiny
    // batch must append a batch=1 directory without rewriting batch=0
    val bands0 = java.nio.file.Paths.get(s"$root/bands/batch=0")
    def parquetFiles(): Array[AnyRef] =
      scala.util.Using.resource(Files.walk(bands0)) { w =>
        w.filter(_.toString.endsWith(".parquet")).map[String](_.toString).sorted().toArray
      }
    val before = parquetFiles()
    idx.addBatch(corpus.filter(col("doc_id") >= 100000).limit(10), "text", "doc_id")
    val after = parquetFiles()
    assert(before.sameElements(after), "batch=0 files must be untouched")
    assert(Files.exists(java.nio.file.Paths.get(s"$root/bands/batch=1")))
  }

  test("minhash compaction folds batches without changing any answer") {
    val corpus = Fixtures.nearDupDocuments(spark, sf())
    val b0 = corpus.filter(col("doc_id") < 200)
    val b1 = corpus.filter(col("doc_id") >= 200 && col("doc_id") < 100000)
    val probe = corpus.filter(col("doc_id") >= 100000)

    val rootA = Files.createTempDirectory("graft_mh_cpt").toString
    val a = MinhashIndex.open(spark, rootA)
    a.addBatch(b0, "text", "doc_id"); a.addBatch(b1, "text", "doc_id")
    val rootB = Files.createTempDirectory("graft_mh_cpt_twin").toString
    val b = MinhashIndex.open(spark, rootB)
    b.addBatch(b0, "text", "doc_id"); b.addBatch(b1, "text", "doc_id")

    a.compact()
    // folded layout: ONE live (file-holding) batch per table — dropParts
    // removes the old cells' files; empty parent dirs are load-invisible
    def liveBatchesOf(t: String) =
      scala.util.Using.resource(
          Files.walk(java.nio.file.Paths.get(s"$rootA/$t"))) {
        _.iterator().asScala
          .filter(p => Files.isRegularFile(p) && p.toString.endsWith(".parquet"))
          .flatMap(_.iterator().asScala.map(_.toString)
            .find(_.startsWith("batch=")))
          .toSet
      }
    assert(liveBatchesOf("shingles").size == 1, liveBatchesOf("shingles"))
    assert(liveBatchesOf("bands").size == 1, liveBatchesOf("bands"))
    // identical probe answers vs the uncompacted twin
    val got = pairs(a.addBatch(probe, "text", "doc_id", threshold = 0.5))
    val want = pairs(b.addBatch(probe, "text", "doc_id", threshold = 0.5))
    assert(got == want, "compaction changed a probe answer")
    // reopen sees the folded state and keeps numbering past the fold
    val re = MinhashIndex.open(spark, rootA)
    assert(re.batches == a.batches)
    assert(re.bandRows.get.count() == b.bandRows.get.count())
  }

  test("exact erasure: a re-ingested forgotten doc is NOT a duplicate of its ghost") {
    val corpus = Fixtures.table(spark, sf(), "documents").select("doc_id", "text")
    val root = Files.createTempDirectory("graft_ex_rm").toString
    val idx = ExactDedupIndex.open(spark, root, nBuckets = 8)
    val b1 = corpus.filter(col("doc_id") < 200)
    idx.addBatch(b1, "text", "doc_id")
    val doomed = b1.filter(col("doc_id") % 7 === 0).select("doc_id")
    val doomedIds = doomed.as[Long].collect().toSet
    assert(idx.remove(doomed, "doc_id") > 0, "erase must rewrite at least one cell")
    // erasure is idempotent: the second pass finds nothing to rewrite
    assert(idx.remove(doomed, "doc_id") == 0)
    // wholesale replay: EXACTLY the forgotten keys come back as new —
    // no ghost suppression, and no leak of still-remembered content
    val replay = idx.addBatch(b1, "text", "doc_id")
      .select("doc").as[Long].collect().toSet
    assert(replay == doomedIds, s"replay=$replay expected=$doomedIds")
    // a reopened handle sees the post-erase state
    val reopened = ExactDedupIndex.open(spark, root, nBuckets = 8)
    assert(reopened.addBatch(b1, "text", "doc_id").count() == 0)
  }

  test("minhash erasure: pairs with erased partners vanish; survivors still pair") {
    val corpus = Fixtures.nearDupDocuments(spark, sf())
    val root = Files.createTempDirectory("graft_mh_rm_spec").toString
    val idx = MinhashIndex.open(spark, root)
    idx.addBatch(corpus.filter(col("doc_id") < 100000), "text", "doc_id")

    // Baseline: which originals the copies WOULD pair with, from a twin
    // index that erases nothing.
    val twinRoot = Files.createTempDirectory("graft_mh_rm_twin").toString
    val twin = MinhashIndex.open(spark, twinRoot)
    twin.addBatch(corpus.filter(col("doc_id") < 100000), "text", "doc_id")
    val baseline = pairs(twin.addBatch(
      corpus.filter(col("doc_id") >= 100000), "text", "doc_id", threshold = 0.5))
    // only ORIGINALS (< 100000) are erased — new-vs-new pairs whose doc_a
    // happens to be divisible by 20 must survive untouched
    val partners = baseline.map(_._1).filter(_ < 100000)
    assert(partners.nonEmpty, "fixture must produce near-dup pairs")
    val (erased, kept) = partners.partition(_ % 20 == 0)
    assert(erased.nonEmpty && kept.nonEmpty, "fixture must split on % 20")

    idx.remove(
      corpus.filter(col("doc_id") < 100000 && col("doc_id") % 20 === 0)
        .select("doc_id"), "doc_id")
    // physical erasure: no band or shingle row of an erased doc survives
    val erasedList = erased.toSeq
    assert(idx.bandRows.get.filter(col("doc").isin(erasedList: _*)).count() == 0)
    assert(idx.shingleRows.get.filter(col("doc").isin(erasedList: _*)).count() == 0)

    val got = pairs(idx.addBatch(
      corpus.filter(col("doc_id") >= 100000), "text", "doc_id", threshold = 0.5))
    assert(got == baseline.filterNot(p => p._1 < 100000 && p._1 % 20 == 0),
      "exactly the erased partners' pairs must vanish")
    // erasure is idempotent and survives reopen
    idx.remove(
      corpus.filter(col("doc_id") < 100000 && col("doc_id") % 20 === 0)
        .select("doc_id"), "doc_id")
    val reopened = MinhashIndex.open(spark, root)
    assert(reopened.bandRows.get.filter(col("doc").isin(erasedList: _*)).count() == 0)
  }
}
