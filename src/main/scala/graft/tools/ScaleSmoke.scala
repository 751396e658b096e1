package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.lake.LakeDataset

/** Scale-headroom smoke: blow sf0.1 lineitem up 10× (~6M rows) in memory
  * (distinct keys per copy), then run the lake's write path end-to-end —
  * create partitioned+bucketed, upsert a 1/7 slice, aggregate, save, load.
  * Prints per-phase seconds. Exercises the same code paths the driver
  * benches, one order of magnitude up.
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = sys.env.getOrElse("SPARK_GRAFT_COPIES", "10").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.buffer.pageSize", "2m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scale] $label%-26s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }

    // SPARK_GRAFT_ONLY_MH=1 skips straight to the MinHash-index curve;
    // SPARK_GRAFT_ONLY_IVF=1 runs just the ANN section;
    // SPARK_GRAFT_ONLY_EX=1 runs just the exact-index curve.
    val onlyEx = sys.env.contains("SPARK_GRAFT_ONLY_EX")
    val runAll = !sys.env.contains("SPARK_GRAFT_ONLY_MH") &&
      !sys.env.contains("SPARK_GRAFT_ONLY_IVF") && !onlyEx
    if (runAll) {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val big = (0 until copies).map { i =>
      li.withColumn("l_orderkey", col("l_orderkey") + lit(i.toLong * 10000000L))
    }.reduce(_ unionByName _)
    val n = time("materialize 10x corpus")(big.localCheckpoint(true).count())
    println(s"[scale] rows: $n")
    val corpus = big

    val ds = time("create (partition+bucket)") {
      LakeDataset.fromDataFrame(spark, corpus,
        partitionCols = Seq("l_returnflag"), bucketCols = Seq("l_partkey"), nBuckets = 5)
    }
    time("upsert 1/7 slice") {
      ds.upsert(corpus.filter(col("l_orderkey") % 7 === 0)
        .withColumn("l_quantity", col("l_quantity") + 100),
        Seq("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"))
    }
    val agg = time("aggregate over union view") {
      ds.toDF.groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(38,2)")).as("q"))
        .collect()
    }
    println(s"[scale] agg rows: ${agg.length}, total n: ${agg.map(_.getLong(1)).sum}")

    val root = java.nio.file.Files.createTempDirectory("graft_scale").toString
    ds.storage = Some(graft.model.StorageSpec(root))
    time("save to storage")(ds.toStorage())
    val back = time("load from storage")(LakeDataset.fromStorage(spark, root))
    val cnt = time("count loaded")(back.toDF.count())
    println(s"[scale] loaded rows: $cnt")
    LakeDataset.deleteRecursively(java.nio.file.Paths.get(root))

    // ---- zone-map pruning at many-part scale -------------------------------
    // orders scaled `copies`x, range-partitioned into ~10 cells per copy so
    // every cell has a disjoint o_orderkey interval. A mutation drops the
    // clean scan, so reads plan the union — the regime where engine-level
    // pruning decides the plan size.
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
    val bigO = (0 until copies).map { i =>
      o.withColumn("o_orderkey", col("o_orderkey") + lit(i.toLong * 10000000L))
    }.reduce(_ unionByName _)
      .withColumn("o_batch", (col("o_orderkey") / 60000L).cast("long"))
    val dz = time("create range-partitioned") {
      LakeDataset.fromDataFrame(spark, bigO, partitionCols = Seq("o_batch"))
    }
    dz.insert(bigO.limit(1)) // drop cleanScan: reads now union all parts
    println(s"[scale] zone dataset parts: ${dz.numParts}")
    val loKey = 1000L
    val hiKey = 60000L
    time("zone-pruned range agg") {
      dz.zoneRangePrunedDF("o_orderkey", loKey, hiKey)
        .filter(col("o_orderkey").between(loKey, hiKey))
        .agg(count(lit(1))).collect()
    }
    time("unpruned range agg") {
      dz.toDF.filter(col("o_orderkey").between(loKey, hiKey))
        .agg(count(lit(1))).collect()
    }
    time("keys-only located delete") {
      import spark.implicits._
      dz.delete((loKey to loKey + 500L).toDF("o_orderkey"), Seq("o_orderkey"))
    }

    // ---- the SAME range query through the SQL surface ----------------------
    // The view resolves to a LakeScan leaf; LakePruneRule rewrites it to the
    // zone-pruned union at optimization time — spark.sql now pays the pruned
    // cost, not the full union the old fixed-plan views captured.
    val db = new graft.lake.Database(spark)
    db.register("orders_scaled", dz)
    time("SQL zone-pruned range agg") {
      spark.sql(
        s"SELECT COUNT(*) FROM orders_scaled WHERE o_orderkey BETWEEN $loKey AND $hiKey")
        .collect()
    }
    val sqlLeaves = spark.sql(
      s"SELECT COUNT(*) FROM orders_scaled WHERE o_orderkey BETWEEN $loKey AND $hiKey")
      .queryExecution.optimizedPlan.collectLeaves().size
    println(s"[scale] SQL plan leaves: $sqlLeaves of ${dz.numParts} parts")
    }

    // ---- IVF ANN: probe cost vs corpus growth ------------------------------
    // The scale claim: an IVF probe reads nprobe inverted LISTS, whose size
    // stays ~constant when the list count grows with the corpus — so probe
    // cost stays flat at N× vectors while the brute-force scan grows ∝ N.
    // Gated out of SPARK_GRAFT_ONLY_MH runs; SPARK_GRAFT_ONLY_IVF=1 runs
    // just this section.
    val onlyIvf = sys.env.contains("SPARK_GRAFT_ONLY_IVF")
    if (runAll || onlyIvf) {
      import graft.operators.Similarity
      val emb0 = spark.read.parquet(s"$sfDir/embeddings.parquet")
        .select("vec_id", "embedding")
      val qv = emb0.filter(col("vec_id") === 7).head().getSeq[Float](1).toSeq
      Seq(1, copies).foreach { nCopies =>
        val e = (0 until nCopies).map { i =>
          emb0.select((col("vec_id") + lit(i.toLong * 1000000L)).as("vec_id"),
            transform(col("embedding"),
              x => (x * (lit(1.0f) + lit(i.toFloat) * lit(1e-4f))).cast("float"))
              .as("embedding"))
        }.reduce(_ unionByName _).localCheckpoint(true)
        val nVec = e.count()
        // lists ∝ corpus keeps per-list size ~constant — the probe contract
        val kLists = 16 * math.max(1, math.sqrt(nCopies.toDouble).toInt)
        val root = java.nio.file.Files.createTempDirectory(s"graft_ivf_sc$nCopies").toString
        val (c, a) = time(f"IVF build ${nCopies}x ($nVec vecs, $kLists lists)")(
          Similarity.buildIvf(e, "embedding", "vec_id", kLists, 64))
        time(s"IVF save ${nCopies}x")(Similarity.saveIvf(spark, root, c, a))
        val idx = time(s"IVF load ${nCopies}x")(Similarity.loadIvf(spark, root))
        time(s"IVF probe nprobe=4 ${nCopies}x")(
          Similarity.ivfTopKLake(idx, "embedding", "vec_id", qv, 10, nprobe = 4).count())
        time(s"brute exact top-k ${nCopies}x")(
          Similarity.bruteForceTopK(e, "embedding", "vec_id", qv, 10).count())
        LakeDataset.deleteRecursively(java.nio.file.Paths.get(root))
      }
    }
    if (onlyIvf) { spark.stop(); return }

    // ---- incremental MinHash: per-batch cost vs a GROWING corpus -----------
    // documents scaled `copies`×, ingested as `copies` equal batches. Every
    // token is salted PER COPY so the copies are genuinely distinct
    // documents (verbatim copies would make batch N a true near-dup of all
    // N-1 prior batches — linear growth in real match work, which is the
    // corpus's fault, not the operator's). With the band/shingle tables
    // bucketed + bloom'd, each addBatch prunes its corpus probe to the
    // cells that may hold a matching hash, so per-batch time should stay
    // ~flat while the index grows `copies`× (the pre-bucketing design
    // re-scanned the whole band table: linear growth).
    val docs0 = spark.read.parquet(s"$sfDir/documents.parquet")
    val bigDocs = (0 until copies).map { i =>
      docs0.withColumn("doc_id", col("doc_id") + lit(i.toLong * 1000000L))
        .withColumn("text", regexp_replace(col("text"), "\\w+", s"$$0c$i"))
    }.reduce(_ unionByName _).localCheckpoint(true)
    println(s"[scale] documents: ${bigDocs.count()} rows")

    // ---- incremental EXACT index: per-batch cost vs a GROWING corpus ------
    // Same contract as the MinHash curve below, but for the fingerprint
    // anti-join: each batch's probe prunes the corpus read to the bucket
    // cells whose Blooms admit one of the batch's hashes, so per-batch time
    // stays ~flat while the index grows `copies`×. The money probe is a
    // tiny batch of NOISY re-ingests of copy-0 docs — normalization folds
    // the noise away, so every key is already present and the batch must
    // come back empty at ∝ batch cost.
    if (runAll || onlyEx) {
      val exRoot = java.nio.file.Files.createTempDirectory("graft_scale_ex").toString
      val exIdx = graft.operators.ExactDedupIndex.open(spark, exRoot, nBuckets = 64)
      (0 until copies).foreach { i =>
        time(f"exact addBatch ${i + 1}%2d/$copies (index holds $i)") {
          exIdx.addBatch(
            bigDocs.filter(col("doc_id") >= i.toLong * 1000000L &&
              col("doc_id") < (i + 1).toLong * 1000000L),
            "text", "doc_id").count()
        }
      }
      if (sys.env.contains("SPARK_GRAFT_MH_PROFILE"))
        spark.conf.set("spark.graft.lake.profile", "true")
      val plantedEx = bigDocs
        .filter(col("doc_id") < 1000000L && col("doc_id") % 100 === 0)
        .select((col("doc_id") + 900000000L).as("doc_id"),
          concat(upper(col("text")), lit("  !!")).as("text"))
      val newDocs = time(s"exact addBatch tiny noisy batch vs ${copies}x index") {
        exIdx.addBatch(plantedEx, "text", "doc_id").count()
      }
      println(s"[scale] tiny-batch new uniques: $newDocs (expect 0)")
      time("exact full recompute (whole corpus)") {
        graft.operators.Dedup.exactNormalized(bigDocs, "text", "doc_id").count()
      }
      LakeDataset.deleteRecursively(java.nio.file.Paths.get(exRoot))
    }
    if (onlyEx) { spark.stop(); return }

    val mhRoot = java.nio.file.Files.createTempDirectory("graft_scale_mh").toString
    val idx = graft.operators.MinhashIndex.open(spark, mhRoot)
    (0 until copies).foreach { i =>
      time(f"addBatch ${i + 1}%2d/$copies (index holds $i)") {
        idx.addBatch(
          bigDocs.filter(col("doc_id") >= i.toLong * 1000000L &&
            col("doc_id") < (i + 1).toLong * 1000000L),
          "text", "doc_id", threshold = 0.5).count()
      }
    }
    // The money probe: a TINY batch of planted near-dups of copy-0 docs
    // against the full `copies`× index. The prune must route it to the
    // matching cells — cost ∝ batch + matches, nowhere near a corpus scan.
    val planted = bigDocs
      .filter(col("doc_id") < 1000000L && col("doc_id") % 100 === 0)
      .withColumn("doc_id", col("doc_id") + 900000000L)
      .withColumn("text", concat(col("text"), lit(" graft near dup suffix")))
    if (sys.env.contains("SPARK_GRAFT_MH_PROFILE")) {
      spark.conf.set("spark.graft.minhash.profile", "true")
      spark.conf.set("spark.graft.lake.profile", "true")
    }
    val found = time(s"addBatch tiny planted batch vs ${copies}x index") {
      idx.addBatch(planted, "text", "doc_id", threshold = 0.5).count()
    }
    println(s"[scale] planted-batch pairs found: $found")

    // ---- one-pass training-pipeline operators over the same corpus ------
    // Each is a single scan with no shuffle beyond a bounded aggregation —
    // the shapes that stay ∝ data at 100 TB.
    time(s"decontaminate ${copies}x (broadcast bench grams)") {
      graft.operators.Dedup.decontaminate(bigDocs,
        bigDocs.filter(col("doc_id") % 500 === 0), "text", "doc_id").count()
    }
    time(s"pack sequences ${copies}x (per-shard windows)") {
      graft.operators.TextAnalysis.packSequences(
        bigDocs, "text", "doc_id", budgetTokens = 2048).count()
    }
    time(s"pii scrub ${copies}x (codegen'd regex)") {
      graft.operators.TextAnalysis.piiScrub(bigDocs, "text", "doc_id")
        .agg(sum("n_redacted")).head()
    }
    time("full recompute (whole corpus)") {
      graft.operators.Dedup.minhashDedup(bigDocs, "text", "doc_id",
        threshold = 0.5).count()
    }
    LakeDataset.deleteRecursively(java.nio.file.Paths.get(mhRoot))
    spark.stop()
  }
}
