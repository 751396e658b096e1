package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

import graft.operators.TextSearch
import graft.model.StorageSpec

class TextSearchSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "spark join window join join"),
    (2L, "spark filter"),
    (3L, "window window window batch merge sort"),
    (4L, "join"),
    (5L, "batch merge sort table scan row column vector agg"),
    (6L, "spark spark spark spark")
  ).toDF("doc_id", "text")

  /** Brute-force BM25 computed independently in plain Scala. */
  private def bruteBm25(
      docs: Seq[(Long, String)], query: String, k1: Double = 1.2, b: Double = 0.75)
      : Map[Long, Double] = {
    val toks = docs.map { case (id, t) => id -> t.trim.split(" ").toSeq }
    val n = docs.size.toDouble
    val avgdl = toks.map(_._2.size).sum / n
    val terms = query.split(" ").distinct.toSeq
    val dfMap = terms.map(t => t -> toks.count(_._2.contains(t))).toMap
    toks.map { case (id, ws) =>
      val dl = ws.size.toDouble
      id -> terms.map { t =>
        val tf = ws.count(_ == t).toDouble
        val df = dfMap(t)
        if (tf == 0 || df == 0) 0.0
        else {
          val idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
          idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))
        }
      }.sum
    }.toMap.filter(_._2 > 0)
  }

  test("postings carry tf and denormalized dl") {
    val p = TextSearch.postings(corpus, "text", "doc_id")
      .filter($"doc" === 1L).collect()
      .map(r => (r.getAs[String]("w"), r.getAs[Long]("tf"), r.getAs[Long]("dl"))).toSet
    assert(p == Set(("spark", 1L, 5L), ("join", 3L, 5L), ("window", 1L, 5L)))
  }

  test("BM25 top-k matches an independent in-memory scorer") {
    val idx = TextSearch.buildIndex(spark, corpus, "text", "doc_id", nBuckets = 8)
    assert(idx.n == 6 && idx.totalLen == 5 + 2 + 6 + 1 + 9 + 4)
    val got = TextSearch.searchTopK(idx, "spark join", 10).collect()
      .map(r => r.getAs[Long]("doc") -> r.getAs[Double]("score"))
    val want = bruteBm25(
      corpus.collect().map(r => (r.getLong(0), r.getString(1))).toSeq, "spark join")
    assert(got.map(_._1).toSeq ==
      want.toSeq.sortBy { case (d, s) => (-s, d) }.map(_._1))
    got.foreach { case (d, s) => assert(math.abs(s - want(d)) < 1e-9, s"doc $d") }
  }

  test("query scan prunes to the queried terms' bucket cells") {
    val root = java.nio.file.Files.createTempDirectory("graft_ftidx").toString
    TextSearch.buildIndex(spark, corpus, "text", "doc_id",
      nBuckets = 8, storage = Some(StorageSpec(root)))
    // Pruning evidence needs the DISK-backed table: each bucket cell is a
    // directory, and scanRootPaths counts the directories a plan reads.
    val idx = TextSearch.open(spark, root)
    val all = Bridge.scanRootPaths(idx.postings.toDF).size
    val one = Bridge.scanRootPaths(
      TextSearch.prunedPostings(idx, TextSearch.queryTerms("spark"))).size
    val two = Bridge.scanRootPaths(
      TextSearch.prunedPostings(idx, TextSearch.queryTerms("spark join"))).size
    assert(all > 2, s"fixture vocabulary should spread over >2 buckets, got $all")
    assert(one == 1)
    assert(two <= 2)
  }

  test("persisted index reopens and answers identically") {
    val root = java.nio.file.Files.createTempDirectory("graft_ftidx2").toString
    val built = TextSearch.buildIndex(spark, corpus, "text", "doc_id",
      nBuckets = 8, storage = Some(StorageSpec(root)))
    val reopened = TextSearch.open(spark, root)
    assert(reopened.n == built.n && reopened.totalLen == built.totalLen)
    val a = TextSearch.searchTopK(built, "window merge", 10).collect().toSeq
    val b = TextSearch.searchTopK(reopened, "window merge", 10).collect().toSeq
    assert(a == b)
  }

  test("integer surrogate preserves the float ranking on the fixture") {
    val idx = TextSearch.buildIndex(spark, corpus, "text", "doc_id", nBuckets = 8)
    for (q <- Seq("spark join", "window merge sort", "vector", "spark")) {
      val f = TextSearch.searchTopK(idx, q, 10).collect().map(_.getAs[Long]("doc")).toSeq
      val i = TextSearch.searchTopKInt(idx, q, 10).collect().map(_.getAs[Long]("doc")).toSeq
      assert(f == i, s"query '$q': float $f vs int $i")
    }
  }

  test("phrase search finds exact occurrences, repeated words included") {
    val docs = Seq(
      (1L, "the quick fox and the quick fox again"),
      (2L, "quick fox"),
      (3L, "the fox quick"),           // words present, order wrong
      (4L, "batch batch batch"),       // overlapping repeated-word phrase
      (5L, "quick quick fox")
    ).toDF("doc_id", "text")
    val idx = TextSearch.buildPositional(spark, docs, "text", "doc_id", nBuckets = 8)

    val qf = TextSearch.phraseSearchTopK(idx, "quick fox", 10).collect()
      .map(r => (r.getAs[Long]("doc"), r.getAs[Long]("n_occ"))).toSeq
    assert(qf == Seq((1L, 2L), (2L, 1L), (5L, 1L)))

    // "batch batch" occurs at starts 0 and 1 in doc 4 — overlap counts.
    val bb = TextSearch.phraseSearchTopK(idx, "batch batch", 10).collect()
      .map(r => (r.getAs[Long]("doc"), r.getAs[Long]("n_occ"))).toSeq
    assert(bb == Seq((4L, 2L)))

    val occ = TextSearch.phraseOccurrences(idx, "the quick fox").collect()
      .map(r => (r.getAs[Long]("doc"), r.getAs[Long]("start"))).toSet
    assert(occ == Set((1L, 0L), (1L, 4L)))

    assert(TextSearch.phraseSearchTopK(idx, "fox the", 10).count() == 0)
  }

  test("positional phrase query prunes to the phrase terms' bucket cells") {
    val root = java.nio.file.Files.createTempDirectory("graft_posidx").toString
    TextSearch.buildPositional(spark, corpus, "text", "doc_id",
      nBuckets = 8, storage = Some(StorageSpec(root)))
    val idx = TextSearch.openPositional(spark, root)
    val all = Bridge.scanRootPaths(idx.postings.toDF).size
    val pruned = Bridge.scanRootPaths(
      TextSearch.phraseOccurrences(idx, "batch merge sort")).size
    assert(all > 3, s"vocabulary should spread over >3 buckets, got $all")
    assert(pruned <= 3)
    // And the pruned plan still answers correctly (docs 3 and 5 contain it).
    val hits = TextSearch.phraseSearchTopK(idx, "batch merge sort", 10).collect()
      .map(r => (r.getAs[Long]("doc"), r.getAs[Long]("n_occ"))).toSeq
    assert(hits == Seq((3L, 1L), (5L, 1L)))
  }

  test("incremental add: index + batch answers exactly like a full rebuild") {
    val root = java.nio.file.Files.createTempDirectory("graft_ftidx3").toString
    val first = corpus.filter($"doc_id" <= 4L)
    val second = corpus.filter($"doc_id" > 4L)
    TextSearch.buildIndex(spark, first, "text", "doc_id",
      nBuckets = 8, storage = Some(StorageSpec(root)))
    val incr = TextSearch.addToIndex(
      TextSearch.open(spark, root), second, "text", "doc_id")
    val full = TextSearch.buildIndex(spark, corpus, "text", "doc_id", nBuckets = 8)
    assert(incr.n == full.n && incr.totalLen == full.totalLen)
    for (q <- Seq("spark join", "batch merge sort", "window")) {
      val a = TextSearch.searchTopK(incr, q, 10).collect()
        .map(r => (r.getAs[Long]("doc"), r.getAs[Double]("score"))).toSeq
      val b = TextSearch.searchTopK(full, q, 10).collect()
        .map(r => (r.getAs[Long]("doc"), r.getAs[Double]("score"))).toSeq
      assert(a == b, s"query '$q'")
    }
    // The append is durable: a REOPENED index sees the batch.
    val reopened = TextSearch.open(spark, root)
    assert(reopened.n == full.n && reopened.totalLen == full.totalLen)
    val r = TextSearch.searchTopK(reopened, "spark join", 10).collect()
      .map(_.getAs[Long]("doc")).toSeq
    val f = TextSearch.searchTopK(full, "spark join", 10).collect()
      .map(_.getAs[Long]("doc")).toSeq
    assert(r == f)
  }

  test("index erasure: removed docs answer like a rebuild without them, persisted") {
    val root = java.nio.file.Files.createTempDirectory("graft_ftidx_rm").toString
    TextSearch.buildIndex(spark, corpus, "text", "doc_id",
      nBuckets = 8, storage = Some(StorageSpec(root)))
    val idx = TextSearch.open(spark, root)

    def dirFiles(): Map[String, Set[String]] = {
      import scala.jdk.CollectionConverters._
      idx.postings.partKeys.map { k =>
        val d = java.nio.file.Paths.get(s"$root/${k.relPath}")
        k.relPath -> scala.util.Using.resource(java.nio.file.Files.list(d))(
          _.iterator().asScala.map(_.getFileName.toString).toSet)
      }.toMap
    }
    val before = dirFiles()

    // erase docs 1 and 6 (both carry 'spark'); doc 2 survives
    val doomed = Seq(1L, 6L).toDF("doc_id")
    val removed = TextSearch.removeFromIndex(idx, doomed, "doc_id")
    val rebuilt = TextSearch.buildIndex(
      spark, corpus.filter(!$"doc_id".isin(1L, 6L)), "text", "doc_id", nBuckets = 8)
    assert(removed.n == rebuilt.n && removed.totalLen == rebuilt.totalLen,
      s"scalars: (${removed.n}, ${removed.totalLen}) vs rebuild " +
        s"(${rebuilt.n}, ${rebuilt.totalLen})")
    for (q <- Seq("spark join", "batch merge sort", "window")) {
      val a = TextSearch.searchTopK(removed, q, 10).collect()
        .map(r => (r.getAs[Long]("doc"), r.getAs[Double]("score"))).toSeq
      val b = TextSearch.searchTopK(rebuilt, q, 10).collect()
        .map(r => (r.getAs[Long]("doc"), r.getAs[Double]("score"))).toSeq
      assert(a == b, s"query '$q'")
    }

    // only the bucket cells that HELD a doomed doc's postings rewrote
    val after = dirFiles()
    val touched = before.keySet.filter(k => after(k) != before(k))
    assert(touched.nonEmpty && touched.size < before.size,
      s"expected a strict subset of cells to rewrite, got ${touched.size}/${before.size}")

    // the erasure is durable: a reopened index re-derives the same scalars
    // from the surviving postings and ranks identically
    val reopened = TextSearch.open(spark, root)
    assert(reopened.n == removed.n && reopened.totalLen == removed.totalLen)
    val r = TextSearch.searchTopK(reopened, "spark join", 10).collect()
      .map(_.getAs[Long]("doc")).toSeq
    val w = TextSearch.searchTopK(rebuilt, "spark join", 10).collect()
      .map(_.getAs[Long]("doc")).toSeq
    assert(r == w)

    // removing ids the index never held is a no-op: same handle, no rewrites
    val ghost = Seq(999L).toDF("doc_id")
    val same = TextSearch.removeFromIndex(reopened, ghost, "doc_id")
    assert(same.n == reopened.n && same.totalLen == reopened.totalLen)
    assert(dirFiles() == after, "ghost erasure must not rewrite any cell")
  }

  test("positional erasure: phrase hits vanish, persisted, other docs unchanged") {
    val root = java.nio.file.Files.createTempDirectory("graft_posidx_rm").toString
    TextSearch.buildPositional(spark, corpus, "text", "doc_id",
      nBuckets = 8, storage = Some(StorageSpec(root)))
    val idx = TextSearch.openPositional(spark, root)
    // docs 3 and 5 both contain the phrase
    val pre = TextSearch.phraseSearchTopK(idx, "batch merge sort", 10).collect()
      .map(_.getAs[Long]("doc")).toSet
    assert(pre == Set(3L, 5L))
    TextSearch.removeFromPositional(idx, Seq(3L).toDF("doc_id"), "doc_id")
    val post = TextSearch.phraseSearchTopK(idx, "batch merge sort", 10).collect()
      .map(_.getAs[Long]("doc")).toSet
    assert(post == Set(5L))
    // durable: a reopened index agrees
    val reopened = TextSearch.openPositional(spark, root)
    val re = TextSearch.phraseSearchTopK(reopened, "batch merge sort", 10).collect()
      .map(_.getAs[Long]("doc")).toSet
    assert(re == Set(5L))
    // other docs' rankings untouched
    assert(TextSearch.phraseSearchTopK(reopened, "join join", 10).collect()
      .map(_.getAs[Long]("doc")).toSeq == Seq(1L))
  }

  test("batch retrieval equals the single-query path for every query row") {
    val idx = TextSearch.buildIndex(spark, corpus, "text", "doc_id", nBuckets = 8)
    val queries = Seq(
      (101L, "spark join"),
      (102L, "window merge sort"),
      (103L, "vector"),
      (104L, "zzz_ghost")
    ).toDF("qid", "qtext")
    val batch = TextSearch.searchBatchTopK(idx, queries, "qtext", "qid", 10)
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rk")) ->
        (r.getAs[Long]("doc"), r.getAs[Double]("score"))).toMap
    val batchInt = TextSearch.searchBatchTopKInt(idx, queries, "qtext", "qid", 10)
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rk")) ->
        r.getAs[Long]("doc")).toMap
    for ((qid, qtext) <- Seq((101L, "spark join"), (102L, "window merge sort"),
        (103L, "vector"))) {
      val single = TextSearch.searchTopK(idx, qtext, 10).collect()
        .map(r => (r.getAs[Long]("doc"), r.getAs[Double]("score"))).toSeq
      val singleInt = TextSearch.searchTopKInt(idx, qtext, 10).collect()
        .map(_.getAs[Long]("doc")).toSeq
      single.zipWithIndex.foreach { case ((d, s), i) =>
        val (bd, bs) = batch((qid, i + 1L))
        assert(bd == d && math.abs(bs - s) < 1e-9, s"query $qid rank ${i + 1}")
      }
      singleInt.zipWithIndex.foreach { case (d, i) =>
        assert(batchInt((qid, i + 1L)) == d, s"int query $qid rank ${i + 1}")
      }
    }
    assert(!batch.keys.exists(_._1 == 104L), "all-ghost query returns nothing")
    // Tiny cap forces the fail-open full-index path — same results.
    val failOpen = TextSearch.searchBatchTopK(idx, queries, "qtext", "qid", 10,
        maxPruneTerms = 2).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rk")) ->
        (r.getAs[Long]("doc"), r.getAs[Double]("score"))).toMap
    assert(failOpen.keySet == batch.keySet)
    failOpen.foreach { case (key, (d, s)) =>
      val (bd, bs) = batch(key)
      assert(d == bd && math.abs(s - bs) < 1e-9, s"fail-open diverges at $key")
    }
  }

  test("bm25Batches: a stream-grown index is indistinguishable from a batch-built one") {
    val all = Fixtures.table(spark, sf(), "documents").select("doc_id", "text")
    val batchBuilt = TextSearch.buildIndex(spark, all, "text", "doc_id", nBuckets = 8)
    val (sink, current) = graft.streaming.StreamingIngest.bm25Batches(
      TextSearch.buildIndex(spark, all.filter(col("doc_id") % 3 === 0),
        "text", "doc_id", nBuckets = 8),
      "text", "doc_id")
    sink(all.filter(col("doc_id") % 3 === 1), 1L)
    sink(all.limit(0), 2L) // empty micro-batch is a no-op
    sink(all.filter(col("doc_id") % 3 === 2), 3L)
    val grown = current()
    assert(grown.n == batchBuilt.n && grown.totalLen == batchBuilt.totalLen)
    // The postings themselves agree row-for-row (batch partition aside).
    def rows(i: TextSearch.Bm25Index) = i.postings.toDF
      .select("doc", "w", "tf", "dl").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sorted.toSeq
    assert(rows(grown) == rows(batchBuilt))
  }

  test("terms absent from the corpus contribute nothing; all-absent is empty") {
    val idx = TextSearch.buildIndex(spark, corpus, "text", "doc_id", nBuckets = 8)
    val withGhost = TextSearch.searchTopK(idx, "spark zzz_ghost", 10).collect()
      .map(r => r.getAs[Long]("doc") -> r.getAs[Double]("score"))
    val plain = TextSearch.searchTopK(idx, "spark", 10).collect()
      .map(r => r.getAs[Long]("doc") -> r.getAs[Double]("score"))
    assert(withGhost.toSeq == plain.toSeq)
    assert(TextSearch.searchTopK(idx, "zzz_ghost", 10).count() == 0)
  }
}
