package graft

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.lake.LakeDataset

/** Shared per-(sfDir) lake fixtures so Verify/Bench don't rebuild the same
  * partitioned dataset for every query that exercises it.
  */
object Fixtures {

  private val cache = TrieMap[String, LakeDataset]()
  private val memo = TrieMap[String, Any]()

  /** IVF index over the embeddings table (16 centroids, dim 64) — built
    * once per scale factor and reused, the way an ANN index amortizes over
    * its query stream; the assigned table is cached for the probe scans.
    */
  def ivfIndex(s: SparkSession, dir: String)
      : (Seq[(Int, Seq[Double])], DataFrame) =
    memo.getOrElseUpdate(s"$dir#ivf", {
      val e = table(s, dir, "embeddings")
      val (c, a) = graft.operators.Similarity.buildIvf(e, "embedding", "vec_id", 16, 64)
      (c, a.cache())
    }).asInstanceOf[(Seq[(Int, Seq[Double])], DataFrame)]

  /** The IVF index persisted to a lake root and loaded BACK — the
    * cross-session amortization path (Similarity.IvfLake). Saved once per
    * scale factor; the loaded handle's inverted lists stay on disk until a
    * probe prunes to them.
    */
  def ivfLake(s: SparkSession, dir: String): graft.operators.Similarity.IvfLake =
    memo.getOrElseUpdate(s"$dir#ivf_lake", {
      val (c, a) = ivfIndex(s, dir)
      val root = java.nio.file.Files.createTempDirectory("graft_ivf").toString
      graft.operators.Similarity.saveIvf(s, root, c, a)
      graft.operators.Similarity.loadIvf(s, root)
    }).asInstanceOf[graft.operators.Similarity.IvfLake]

  /** A SECOND persisted IVF index with every `vec_id % 10 == 0` vector
    * ERASED through [[graft.operators.Similarity.removeFromIvf]] and then
    * reloaded from disk — so the ann_ivf_removed gate oracle-checks the
    * PERSISTED post-erasure state (GDPR-delete path), not just the
    * in-memory handle. Built once per scale factor.
    */
  def ivfLakeRemoved(s: SparkSession, dir: String): graft.operators.Similarity.IvfLake =
    memo.getOrElseUpdate(s"$dir#ivf_lake_removed", {
      val (c, a) = ivfIndex(s, dir)
      val root = java.nio.file.Files.createTempDirectory("graft_ivf_removed").toString
      graft.operators.Similarity.saveIvf(s, root, c, a)
      val idx = graft.operators.Similarity.loadIvf(s, root)
      val doomed = table(s, dir, "embeddings")
        .select("vec_id").filter(col("vec_id") % 10 === 0)
      graft.operators.Similarity.removeFromIvf(idx, doomed, "vec_id")
      graft.operators.Similarity.loadIvf(s, root)
    }).asInstanceOf[graft.operators.Similarity.IvfLake]

  /** PQ codebooks over the embeddings table (dim 64, 16 subspaces of 4
    * elements, 256 sub-centroids) — trained once per scale factor from the
    * deterministic bounded sample; a PQ model amortizes over every encode
    * and query like any ANN index.
    */
  def pqModel(s: SparkSession, dir: String): graft.operators.Pq.PqModel =
    memo.getOrElseUpdate(s"$dir#pq", {
      graft.operators.Pq.train(table(s, dir, "embeddings"),
        "embedding", "vec_id", dim = 64, m = 16, ksub = 256)
    }).asInstanceOf[graft.operators.Pq.PqModel]

  /** The embeddings table with its PQ code column materialized — encoding
    * is index-BUILD work (one corpus pass), amortized like any index;
    * queries measure the ADC scan.
    */
  def pqEncoded(s: SparkSession, dir: String): DataFrame =
    memo.getOrElseUpdate(s"$dir#pq_encoded", {
      graft.operators.Pq.encode(table(s, dir, "embeddings"), "embedding",
        pqModel(s, dir)).localCheckpoint(true)
    }).asInstanceOf[DataFrame]

  /** The persisted IVF index's inverted lists re-materialized WITH PQ codes
    * (full IVF-PQ layout) — encoded once per scale factor.
    */
  def ivfPqLists(s: SparkSession, dir: String): LakeDataset =
    memo.getOrElseUpdate(s"$dir#ivfpq", {
      val root = java.nio.file.Files.createTempDirectory("graft_ivfpq_fix").toString
      graft.operators.Pq.encodeIvfLists(s, root, ivfLake(s, dir),
        pqModel(s, dir), "embedding")
    }).asInstanceOf[LakeDataset]

  /** The PQ-coded inverted lists with `vec_id % 10 == 0` ERASED through
    * [[graft.operators.Similarity.removeFromIvf]] (the coded lake is
    * centroid-partitioned exactly like the float lists, so the same
    * locate-delete-saveParts maintenance applies) and reloaded from disk.
    */
  def ivfPqListsRemoved(s: SparkSession, dir: String): LakeDataset =
    memo.getOrElseUpdate(s"$dir#ivfpq_removed", {
      val root = java.nio.file.Files.createTempDirectory("graft_ivfpq_rm").toString
      val lists = graft.operators.Pq.encodeIvfLists(s, root, ivfLake(s, dir),
        pqModel(s, dir), "embedding")
      val doomed = table(s, dir, "embeddings")
        .select("vec_id").filter(col("vec_id") % 10 === 0)
      graft.operators.Similarity.removeFromIvf(
        graft.operators.Similarity.IvfLake(ivfLake(s, dir).centroids, lists),
        doomed, "vec_id")
      LakeDataset.fromStorage(s, s"$root/assigned_pq")
    }).asInstanceOf[LakeDataset]

  /** BM25 inverted index over the documents table — built and persisted
    * once per scale factor, then REOPENED from disk so gate queries
    * exercise the production path: driver-side bucket pruning into the
    * persisted postings cells (TextSearch scaladoc has the layout).
    */
  def bm25Index(s: SparkSession, dir: String): graft.operators.TextSearch.Bm25Index =
    memo.getOrElseUpdate(s"$dir#bm25", {
      val root = java.nio.file.Files.createTempDirectory("graft_bm25").toString
      graft.operators.TextSearch.buildIndex(s, table(s, dir, "documents"),
        "text", "doc_id", nBuckets = 16,
        storage = Some(graft.model.StorageSpec(root)))
      graft.operators.TextSearch.open(s, root)
    }).asInstanceOf[graft.operators.TextSearch.Bm25Index]

  /** A SECOND persisted BM25 index with every `doc_id % 10 == 0` document
    * ERASED through [[graft.operators.TextSearch.removeFromIndex]] and then
    * REOPENED from disk — [[graft.operators.TextSearch.open]] re-derives
    * the corpus scalars from the surviving postings, so the require below
    * cross-checks the erasure path's integer subtraction against the
    * persisted ground truth, and the text_bm25_removed gate oracle-checks
    * the ranking over the survivors.
    */
  def bm25IndexRemoved(s: SparkSession, dir: String): graft.operators.TextSearch.Bm25Index =
    memo.getOrElseUpdate(s"$dir#bm25_removed", {
      val root = java.nio.file.Files.createTempDirectory("graft_bm25_removed").toString
      graft.operators.TextSearch.buildIndex(s, table(s, dir, "documents"),
        "text", "doc_id", nBuckets = 16,
        storage = Some(graft.model.StorageSpec(root)))
      val idx = graft.operators.TextSearch.open(s, root)
      val doomed = table(s, dir, "documents")
        .select("doc_id").filter(col("doc_id") % 10 === 0)
      val removed = graft.operators.TextSearch.removeFromIndex(idx, doomed, "doc_id")
      val reopened = graft.operators.TextSearch.open(s, root)
      require(reopened.n == removed.n && reopened.totalLen == removed.totalLen,
        s"erasure drift: persisted (${reopened.n}, ${reopened.totalLen}) " +
          s"vs subtracted (${removed.n}, ${removed.totalLen})")
      reopened
    }).asInstanceOf[graft.operators.TextSearch.Bm25Index]

  /** A SECOND persisted positional index with `doc_id % 10 == 0` erased
    * through [[graft.operators.TextSearch.removeFromPositional]] and
    * reopened from disk — same stance as [[bm25IndexRemoved]].
    */
  def posIndexRemoved(s: SparkSession, dir: String): graft.operators.TextSearch.PositionalIndex =
    memo.getOrElseUpdate(s"$dir#posidx_removed", {
      val root = java.nio.file.Files.createTempDirectory("graft_posidx_removed").toString
      graft.operators.TextSearch.buildPositional(s, table(s, dir, "documents"),
        "text", "doc_id", nBuckets = 16,
        storage = Some(graft.model.StorageSpec(root)))
      val idx = graft.operators.TextSearch.openPositional(s, root)
      val doomed = table(s, dir, "documents")
        .select("doc_id").filter(col("doc_id") % 10 === 0)
      graft.operators.TextSearch.removeFromPositional(idx, doomed, "doc_id")
      graft.operators.TextSearch.openPositional(s, root)
    }).asInstanceOf[graft.operators.TextSearch.PositionalIndex]

  /** Positional (phrase) index over documents — persisted once per scale
    * factor and reopened, same stance as [[bm25Index]].
    */
  def posIndex(s: SparkSession, dir: String): graft.operators.TextSearch.PositionalIndex =
    memo.getOrElseUpdate(s"$dir#posidx", {
      val root = java.nio.file.Files.createTempDirectory("graft_posidx").toString
      graft.operators.TextSearch.buildPositional(s, table(s, dir, "documents"),
        "text", "doc_id", nBuckets = 16,
        storage = Some(graft.model.StorageSpec(root)))
      graft.operators.TextSearch.openPositional(s, root)
    }).asInstanceOf[graft.operators.TextSearch.PositionalIndex]

  /** A change-feed-tracked orders table after a fixed mutation history
    * (base logged, an insert, a group-touching upsert, a delete) — built
    * once per scale factor; the feed queries read the log/time-travel
    * reconstruction, the way consumers of a long-lived feed do. Returns
    * the feed and the seq mark taken right after the insert.
    */
  def trackedOrders(s: SparkSession, dir: String): (graft.lake.TrackedLake, Long) =
    memo.getOrElseUpdate(s"$dir#cdf", {
      val o = table(s, dir, "orders")
      val t = graft.lake.TrackedLake(s,
        LakeDataset.fromDataFrame(s, o.filter(col("o_orderkey") % 4 === 0),
          partitionCols = Seq("o_orderstatus")),
        logBase = true)
      val mark = t.insert(o.filter(col("o_orderkey") % 4 === 1))
      t.upsert(o.filter(col("o_custkey") % 3 === 0 &&
          (col("o_orderkey") % 4 === 0 || col("o_orderkey") % 4 === 2))
        .withColumn("o_totalprice", col("o_totalprice") + 100), Seq("o_orderkey"))
      t.delete(o.filter(col("o_orderkey") % 4 === 1 && col("o_custkey") % 5 === 0)
        .select("o_orderkey"), Seq("o_orderkey"))
      (t, mark)
    }).asInstanceOf[(graft.lake.TrackedLake, Long)]

  /** A DURABLE feed (autoSave: every mutation's cell persisted as it
    * lands) with the same mutation recipe as [[trackedOrders]] — the
    * streaming gate tails its log root with a file-stream query.
    */
  def streamedOrders(s: SparkSession, dir: String): graft.lake.TrackedLake =
    memo.getOrElseUpdate(s"$dir#cdf_stream", {
      val root = java.nio.file.Files.createTempDirectory("graft_cdf_sfx").toString
      val o = table(s, dir, "orders")
      val t = graft.lake.TrackedLake(s,
        LakeDataset.fromDataFrame(s, o.filter(col("o_orderkey") % 4 === 0),
          partitionCols = Seq("o_orderstatus")),
        logRoot = Some(root), logBase = true, autoSave = true)
      t.insert(o.filter(col("o_orderkey") % 4 === 1))
      t.upsert(o.filter(col("o_custkey") % 3 === 0 &&
          (col("o_orderkey") % 4 === 0 || col("o_orderkey") % 4 === 2))
        .withColumn("o_totalprice", col("o_totalprice") + 100), Seq("o_orderkey"))
      t.delete(o.filter(col("o_orderkey") % 4 === 1 && col("o_custkey") % 5 === 0)
        .select("o_orderkey"), Seq("o_orderkey"))
      t
    }).asInstanceOf[graft.lake.TrackedLake]

  /** A feed whose log was CHECKPOINTED at the post-insert mark — the base
    * commit and the insert collapse into ONE base cell — and then mutated
    * further. Reconstruction queries must compose the base cell with the
    * post-checkpoint tail (the checkpoint-plus-log read every
    * log-structured format serves).
    */
  def checkpointedOrders(s: SparkSession, dir: String): graft.lake.TrackedLake =
    memo.getOrElseUpdate(s"$dir#cdf_ckpt", {
      val o = table(s, dir, "orders")
      val t = graft.lake.TrackedLake(s,
        LakeDataset.fromDataFrame(s, o.filter(col("o_orderkey") % 4 === 0),
          partitionCols = Seq("o_orderstatus")),
        logBase = true)
      val mark = t.insert(o.filter(col("o_orderkey") % 4 === 1))
      t.checkpoint(mark, Seq("o_orderkey"))
      t.upsert(o.filter(col("o_custkey") % 3 === 0 &&
          (col("o_orderkey") % 4 === 0 || col("o_orderkey") % 4 === 2))
        .withColumn("o_totalprice", col("o_totalprice") + 100), Seq("o_orderkey"))
      t.delete(o.filter(col("o_orderkey") % 4 === 1 && col("o_custkey") % 5 === 0)
        .select("o_orderkey"), Seq("o_orderkey"))
      t
    }).asInstanceOf[graft.lake.TrackedLake]

  /** A bootstrapped MinHash index root holding the ORIGINAL documents —
    * built once per scale factor. Queries copy the root and add their delta
    * batch, so each run measures the MARGINAL per-batch cost against an
    * existing corpus index (the operator's whole point), not a bootstrap.
    */
  def minhashIndexRoot(s: SparkSession, dir: String): String =
    memo.getOrElseUpdate(s"$dir#mh_root", {
      val root = java.nio.file.Files.createTempDirectory("graft_mh_fix").toString
      val idx = graft.operators.MinhashIndex.open(s, root)
      idx.addBatch(table(s, dir, "documents"), "text", "doc_id", threshold = 0.5)
      root
    }).asInstanceOf[String]

  /** Recursive directory copy (index roots are small derived state). */
  def copyDir(from: String, to: String): Unit = {
    val src = java.nio.file.Paths.get(from)
    val dst = java.nio.file.Paths.get(to)
    scala.util.Using.resource(java.nio.file.Files.walk(src)) { walk =>
      walk.forEach { p =>
        val t = dst.resolve(src.relativize(p))
        if (java.nio.file.Files.isDirectory(p)) java.nio.file.Files.createDirectories(t)
        else java.nio.file.Files.copy(p, t,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    }
  }

  def table(s: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(s, dir)
    else s.read.parquet(s"$dir/$name.parquet")

  /** The events table's `ts` column has shipped in two generations: a
    * TIMESTAMP(NANOS) parquet type, which Spark only reads as a long of
    * nanos (legacy conf), and a plain timestamp[us] (isAdjustedToUTC=false),
    * which Spark infers as TIMESTAMP_NTZ by default. Normalize both to a
    * session-zone TimestampType of microseconds so every downstream
    * operator sees one schema.
    *
    * The µs generation normalizes AT THE SCAN — `inferTimestampNTZ.enabled
    * =false` makes the parquet reader produce TimestampType directly — not
    * via a post-scan cast: a derived `ts` column stops every time predicate
    * from reaching the scan as a PushedFilter (measured 5× on the session-
    * window queries), and under the UTC session zone the scan-level read is
    * value-identical to the NTZ→LTZ cast it replaces. The nanos branch uses
    * integer division — a double division would lose precision above
    * 2^53 ns.
    */
  private def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    val raw = s.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _ => raw // TimestampType at the scan — pushdown intact
    }
  }

  /** lineitem partitioned by l_returnflag, hash-bucketed by l_partkey into 5
    * buckets — the testdata stand-in for the reference's `stock_current`
    * layout (FIXTURES.md role mapping; reference src/dataset.rs:427-428).
    */
  def lineitemLake(s: SparkSession, dir: String): LakeDataset =
    cache.getOrElseUpdate(s"$dir#lineitem", LakeDataset.fromDataFrame(
      s, table(s, dir, "lineitem"),
      partitionCols = Seq("l_returnflag"),
      bucketCols = Seq("l_partkey"),
      nBuckets = 5))

  /** part hash-bucketed by p_partkey into 5 buckets — the co-located join
    * partner of [[lineitemLake]] (same bucket function, same count).
    */
  def partLake(s: SparkSession, dir: String): LakeDataset =
    cache.getOrElseUpdate(s"$dir#part", LakeDataset.fromDataFrame(
      s, table(s, dir, "part"),
      bucketCols = Seq("p_partkey"),
      nBuckets = 5))

  /** lineitem in `l_orderkey div 2000` range cells — the FACT layout for
    * the catalog-driven DPP join: each cell's l_orderkey zone is a disjoint
    * range, so a dimension whose filtered keys cluster in a range prunes
    * whole fact cells before any read.
    */
  def lineitemRangeLake(s: SparkSession, dir: String): LakeDataset =
    cache.getOrElseUpdate(s"$dir#lineitem_range", LakeDataset.fromDataFrame(
      s, table(s, dir, "lineitem")
        .withColumn("l_batch", (col("l_orderkey") / 2000).cast("int")),
      partitionCols = Seq("l_batch")))

  /** orders partitioned by `o_orderkey div 6000` — cells with DISJOINT
    * orderkey ranges, the layout where zone-map pruning on a non-partition
    * column skips every cell a range predicate cannot touch.
    */
  def ordersZoneLake(s: SparkSession, dir: String): LakeDataset =
    cache.getOrElseUpdate(s"$dir#orders_zone", LakeDataset.fromDataFrame(
      s, table(s, dir, "orders")
        .withColumn("o_batch", (col("o_orderkey") / 6000).cast("int")),
      partitionCols = Seq("o_batch")))

  /** Same layout at finer grain (4 cells at sf0.01) — an IN-list over two
    * NON-ADJACENT cells keeps 2 of 4, past the clean-scan-beats-most-parts
    * fallback, so the per-value prune is visible in the plan.
    */
  /** [[ordersZoneLake]] with an HLL distinct sketch maintained on
    * o_custkey — the approx-distinct metadata-collapse fixture.
    */
  def ordersSketchLake(s: SparkSession, dir: String): LakeDataset =
    cache.getOrElseUpdate(s"$dir#orders_sketch", LakeDataset.fromDataFrame(
      s, table(s, dir, "orders")
        .withColumn("o_batch", (col("o_orderkey") / 6000).cast("int")),
      partitionCols = Seq("o_batch"), sketchCols = Seq("o_custkey")))

  def ordersZoneLake4(s: SparkSession, dir: String): LakeDataset =
    cache.getOrElseUpdate(s"$dir#orders_zone4", LakeDataset.fromDataFrame(
      s, table(s, dir, "orders")
        .withColumn("o_batch", (col("o_orderkey") / 4000).cast("int")),
      partitionCols = Seq("o_batch")))

  /** documents ∪ exact copies of every 10th doc (new ids) — a corpus with
    * known exact duplicates for the dedup operators.
    */
  def dupDocuments(s: SparkSession, dir: String): DataFrame = {
    val d = table(s, dir, "documents")
    d.unionByName(d.filter(col("doc_id") % 10 === 0)
      .withColumn("doc_id", col("doc_id") + 100000))
  }

  /** documents ∪ slightly mutated copies of every 10th doc (a few appended
    * words) — known NEAR duplicates with high n-gram Jaccard.
    */
  def nearDupDocuments(s: SparkSession, dir: String): DataFrame = {
    val d = table(s, dir, "documents")
    d.unionByName(d.filter(col("doc_id") % 10 === 0)
      .withColumn("doc_id", col("doc_id") + 100000)
      .withColumn("text", concat(col("text"), lit(" graft near dup suffix"))))
  }

  /** documents ∪ byte-exact copies (every 20th, +200000) ∪ near-dup
    * copies (every 10th, +100000, appended suffix) — the planted corpus
    * for the full dedup-pipeline composition gate: the exact stage must
    * drop the +200000 copies, the near-dup stage the suffix replays'
    * losers.
    */
  def pipelineDedupCorpus(s: SparkSession, dir: String): DataFrame = {
    val d = table(s, dir, "documents")
    d.unionByName(d.filter(col("doc_id") % 10 === 0)
        .withColumn("doc_id", col("doc_id") + 100000)
        .withColumn("text", concat(col("text"), lit(" graft near dup suffix"))))
      .unionByName(d.filter(col("doc_id") % 20 === 0)
        .withColumn("doc_id", col("doc_id") + 200000))
  }

  /** embeddings ∪ jittered copies of every 10th vector (×1.001 per element,
    * cosine ≈ 1 with the original) — known embedding near-duplicates.
    */
  def jitteredEmbeddings(s: SparkSession, dir: String): DataFrame = {
    val e = table(s, dir, "embeddings")
    e.unionByName(e.filter(col("vec_id") % 10 === 0)
      .withColumn("vec_id", col("vec_id") + 100000)
      .withColumn("embedding",
        transform(col("embedding"), x => (x * lit(1.001f)).cast("float"))))
  }

  def clear(): Unit = { cache.clear(); memo.clear() }
}
