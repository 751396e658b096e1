package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Multimodal, Similarity, TextAnalysis}

class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------------------ dedup

  test("exact dedup groups identical texts under min id") {
    val df = Seq((1L, "aaa"), (2L, "bbb"), (3L, "aaa")).toDF("id", "text")
    val got = Dedup.exact(df, "text", "id")
      .select("canonical_id", "dup_count").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L), (2L, 1L)))
  }

  test("minhash LSH finds planted near-duplicates with high jaccard") {
    val pairs = Dedup.minhashDedup(
      Fixtures.nearDupDocuments(spark, sf()), "text", "doc_id", threshold = 0.5)
      .select("doc_a", "doc_b", "jaccard").as[(Long, Long, Double)].collect()
    val planted = pairs.filter { case (a, b, _) => b == a + 100000 }
    assert(planted.length >= 45, s"expected >=45 of 50 planted pairs, got ${planted.length}")
    assert(planted.forall(_._3 >= 0.5))
  }

  test("jaccard verify computes the exact set jaccard") {
    val df = Seq((1L, "a b c d"), (2L, "a b c e")).toDF("id", "text")
    val cands = Seq((1L, 2L)).toDF("doc_a", "doc_b")
    val j = Dedup.jaccardVerify(cands, df, "text", "id", shingleSize = 1)
      .select("jaccard").as[Double].head()
    // shingle sets {a,b,c,d} vs {a,b,c,e}: |∩|=3, |∪|=5
    assert(math.abs(j - 0.6) < 1e-12)
  }

  test("exact n-gram Jaccard pairs: LSH path finds a subset of the exact ground truth") {
    val exact = Dedup.ngramJaccardPairs(
      Fixtures.nearDupDocuments(spark, sf()), "text", "doc_id", threshold = 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.minhashDedup(
      Fixtures.nearDupDocuments(spark, sf()), "text", "doc_id", threshold = 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(exact), s"LSH produced pairs not in ground truth: ${lsh -- exact}")
    val planted = exact.count { case (a, b) => b == a + 100000 }
    assert(planted >= 45, s"expected >=45 of 50 planted pairs in ground truth, got $planted")
  }

  test("exact embedding pairs: LSH near-dup agrees with the exact all-pairs result") {
    val exact = Dedup.embeddingExactPairs(
      Fixtures.jitteredEmbeddings(spark, sf()), "embedding", "vec_id", threshold = 0.9)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.embeddingNearDup(
      Fixtures.jitteredEmbeddings(spark, sf()), "embedding", "vec_id", threshold = 0.9)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(exact))
    val planted = (0L until 500L by 10).map(i => (i, i + 100000)).toSet
    assert(planted.subsetOf(exact), s"missing planted: ${planted -- exact}")
  }

  test("semantic dedup: cluster-bucketed pairs ⊆ exact, all planted found") {
    val emb = Fixtures.jitteredEmbeddings(spark, sf())
    val sem = Dedup.semanticDedup(emb, "embedding", "vec_id",
        numClusters = 8, dim = 64, threshold = 0.9)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // in-cluster verification is exact cosine -> never a far pair (the
    // 0.89 margin absorbs float-vs-quantized-double threshold ulps)
    val nearish = Dedup.embeddingExactPairs(emb, "embedding", "vec_id",
        threshold = 0.89)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert((sem -- nearish).isEmpty, s"false pairs: ${sem -- nearish}")
    // the planted 1.001x copies are scale-invariant under cosine, so they
    // share their original's nearest centroid and MUST co-cluster
    val planted = (0L until 500L by 10).map(i => (i, i + 100000)).toSet
    assert(planted.subsetOf(sem), s"missing planted: ${planted -- sem}")
  }

  test("simhash: identical texts hamming 0, planted near-dups found") {
    val sh = Seq((1L, "w1 w2 w3 w4 w5"), (2L, "w1 w2 w3 w4 w5")).toDF("id", "text")
      .select(Dedup.simhash(col("text")).as("s")).as[Long].collect()
    assert(sh(0) == sh(1))
    val found = Dedup.simhashDedup(
      Fixtures.nearDupDocuments(spark, sf()), "text", "doc_id")
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
      .count { case (a, b) => b == a + 100000 }
    assert(found >= 40, s"expected >=40 of 50 planted simhash pairs, got $found")
  }

  test("embedding LSH near-dup finds all jittered copies") {
    val got = Dedup.embeddingNearDup(
      Fixtures.jitteredEmbeddings(spark, sf()), "embedding", "vec_id", threshold = 0.9)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val expected = (0L until 500L by 10).map(i => (i, i + 100000)).toSet
    assert(expected.subsetOf(got), s"missing: ${expected -- got}")
  }

  test("DataFrame-level signatures agree with expression-level implementations") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet").limit(50)
    val fastM = Dedup.minhashSignatures(docs, "text", "doc_id", 16, 3)
    val exprM = docs.select(col("doc_id").as("doc"),
      Dedup.minhashSignature(Dedup.shingles(col("text"), 3), 16).as("sig2"))
    val diffM = fastM.join(exprM, "doc")
      .filter(col("sig") =!= col("sig2")).count()
    assert(diffM == 0, "minhash implementations disagree")

    val fastS = Dedup.simhashSignatures(docs, "text", "doc_id")
    val exprS = docs.select(col("doc_id").as("doc"), Dedup.simhash(col("text")).as("sh2"))
    val diffS = fastS.join(exprS, "doc")
      .filter(col("sh") =!= col("sh2")).count()
    assert(diffS == 0, "simhash implementations disagree")
  }

  // ------------------------------------------------------------- similarity

  test("native CosineF32 expression is bit-identical to the HOF formulation") {
    val e = spark.read.parquet(s"${sf()}/embeddings.parquet")
    val paired = e.as("a").join(e.as("b"),
      col("a.vec_id") === col("b.vec_id") - 250)
    val diff = paired.select(
      Similarity.cosine(col("a.embedding"), col("b.embedding")).as("native"),
      Similarity.cosineHof(col("a.embedding"), col("b.embedding")).as("hof"))
      .filter(col("native") =!= col("hof")).count()
    assert(diff == 0, "native and HOF cosine disagree")
  }

  test("CentroidArgmax matches the composed array_max form bit-for-bit, sparse ids, ties") {
    // Include a corrupt NaN embedding: array_max orders doubles by the
    // TOTAL order (NaN greatest), and the native expression must route the
    // corrupt vector to the same list.
    val e = spark.read.parquet(s"${sf()}/embeddings.parquet")
      .select("vec_id", "embedding")
      .unionByName(spark.sql(
        "SELECT 999999L AS vec_id, " +
          "array(cast('NaN' as float), cast(1.0 as float)) AS embedding"))
    // Sparse, unsorted-at-call-site ids (the post-recluster shape): the
    // expression must return the ID of the nearest centroid, not its row.
    val cents: Seq[(Int, Seq[Double])] = Seq(3, 17, 64, 200).zipWithIndex.map {
      case (cid, i) =>
        cid -> e.filter(col("vec_id") === i * 100).head().getSeq[Float](1)
          .map(_.toDouble).toSeq
    }
    val composed = e.withColumn("centroid", array_max(array(cents.map { case (cid, cv) =>
      struct(Similarity.cosine(col("embedding"),
        array(cv.map(x => lit(x.toFloat)): _*)).as("score"), lit(cid).as("cid"))
    }: _*)).getField("cid"))
    val native = e.withColumn("centroid",
      graft.functions.CentroidArgmax(col("embedding"), cents))
    val diff = composed.select(col("vec_id"), col("centroid").as("c1"))
      .join(native.select(col("vec_id"), col("centroid").as("c2")), "vec_id")
      .filter(col("c1") =!= col("c2")).count()
    assert(diff == 0, "native argmax and composed form disagree")
    // Tie-break: a vector equidistant from two identical centroids must
    // take the LARGER id (array_max lexicographic semantics).
    val twin = Seq((1L, Seq(1f, 0f))).toDF("vec_id", "embedding")
    val tied = twin.select(graft.functions.CentroidArgmax(col("embedding"),
      Seq(5 -> Seq(1.0, 0.0), 9 -> Seq(1.0, 0.0))).as("c")).head().getInt(0)
    assert(tied == 9, s"tie must pick the larger id, got $tied")
  }

  test("CentroidProbes matches the composed sort-of-structs probe order exactly") {
    val e = spark.read.parquet(s"${sf()}/embeddings.parquet")
    val cents: Seq[(Int, Seq[Double])] = Seq(2, 9, 31, 77, 150).zipWithIndex.map {
      case (cid, i) =>
        cid -> e.filter(col("vec_id") === i * 97).head().getSeq[Float](1)
          .map(_.toDouble).toSeq
    }
    val nprobe = 3
    val scored = cents.map { case (cid, cv) =>
      struct((-Similarity.cosine(col("embedding"),
        array(cv.map(x => lit(x.toFloat)): _*))).as("neg"), lit(cid).as("cid"))
    }
    val composed = e.select(col("vec_id"),
      transform(slice(array_sort(array(scored: _*)), 1, nprobe),
        p => p.getField("cid")).as("p1"))
    val native = e.select(col("vec_id"),
      graft.functions.CentroidProbes(col("embedding"), cents, nprobe).as("p2"))
    val diff = composed.join(native, "vec_id")
      .filter(col("p1") =!= col("p2")).count()
    assert(diff == 0, "native probe selection diverges from the composed form")
    // nprobe beyond the list count returns every id, best-first
    val all = e.limit(1).select(graft.functions.CentroidProbes(
      col("embedding"), cents, 99)).head().getSeq[Int](0)
    assert(all.length == cents.size && all.toSet == cents.map(_._1).toSet)
  }

  test("HyperplaneSig is bit-identical to the per-plane HOF formulation") {
    val e = spark.read.parquet(s"${sf()}/embeddings.parquet")
    val rnd = new scala.util.Random(42L)
    val planeVecs: Seq[Seq[Double]] = Seq.fill(8)(Seq.fill(64)(rnd.nextGaussian()))
    val hofBits = planeVecs.zipWithIndex.map { case (p, i) =>
      val dot = aggregate(
        zip_with(col("embedding"), array(p.map(lit): _*),
          (x, y) => x.cast("double") * y),
        lit(0.0), (acc, v) => acc + v)
      when(dot >= 0, lit(1L << i)).otherwise(lit(0L))
    }
    val diff = e.select(col("vec_id"),
        hofBits.reduce((a, b) => a.bitwiseOR(b)).as("hof"),
        graft.functions.HyperplaneSig(col("embedding"), planeVecs).as("native"))
      .filter(col("hof") =!= col("native")).count()
    assert(diff == 0, "native and HOF hyperplane signatures disagree")
    // Dimension mismatch: zip_with pads the shorter side with null, the
    // aggregate dot goes null, and `null >= 0` sets nothing — a short (or
    // overlong) vector must leave every bit clear in BOTH forms.
    val short = Seq((1L, Seq(0.5f, -0.25f, 1.5f))).toDF("vec_id", "embedding")
    val m = short.select(
      hofBits.reduce((a, b) => a.bitwiseOR(b)).as("hof"),
      graft.functions.HyperplaneSig(col("embedding"), planeVecs).as("native")).head()
    assert(m.getLong(0) == 0L && m.getLong(1) == 0L,
      s"dimension-mismatched vector must bucket as signature 0 in both forms, " +
        s"got hof=${m.getLong(0)} native=${m.getLong(1)}")
  }

  test("CosineF32 rejects non-float-array inputs at analysis") {
    val df = Seq((Seq(1.0, 2.0), Seq(1.0f, 2.0f))).toDF("d", "f")
    intercept[Exception] {
      df.select(graft.functions.CosineF32(col("d"), col("f"))).collect()
    }
  }

  test("cosine: identical=1, orthogonal=0") {
    val df = Seq((Seq(1f, 0f), Seq(1f, 0f), Seq(0f, 1f))).toDF("a", "b", "c")
    val r = df.select(
      Similarity.cosine(col("a"), col("b")).as("same"),
      Similarity.cosine(col("a"), col("c")).as("orth")).head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(r.getDouble(1)) < 1e-12)
  }

  test("brute-force top-k: self is rank 1; k rows returned") {
    val e = spark.read.parquet(s"${sf()}/embeddings.parquet")
    val q = e.filter(col("vec_id") === 3).head().getSeq[Float](1).toSeq
    val top = Similarity.bruteForceTopK(e, "embedding", "vec_id", q, 5)
      .as[(Long, Double)].collect()
    assert(top.length == 5)
    assert(top.head._1 == 3L && math.abs(top.head._2 - 1.0) < 1e-9)
  }

  test("IVF top-k achieves >=60% recall@10 vs brute force with nprobe=4/16") {
    val e = spark.read.parquet(s"${sf()}/embeddings.parquet")
    val q = e.filter(col("vec_id") === 3).head().getSeq[Float](1).toSeq
    val brute = Similarity.bruteForceTopK(e, "embedding", "vec_id", q, 10)
      .select("vec_id").as[Long].collect().toSet
    val (centroids, assigned) = Similarity.buildIvf(e, "embedding", "vec_id", 16, 64)
    val ivf = Similarity.ivfTopK(assigned, centroids, "embedding", "vec_id", q, 10, 4)
      .select("vec_id").as[Long].collect().toSet
    val recall = (brute & ivf).size / 10.0
    assert(recall >= 0.6, s"recall@10 = $recall")
  }

  test("batch ANN: IVF similarity join reaches >=60% mean recall@5 vs exact") {
    val e = spark.read.parquet(s"${sf()}/embeddings.parquet")
    val queries = e.filter(col("vec_id") % 25 === 0)
    val exact = Similarity.exactBatchTopKQuantized(queries, e, "embedding", "vec_id", 5)
      .select("query_id", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val (centroids, assigned) = Similarity.buildIvf(e, "embedding", "vec_id", 16, 64)
    val ivf = Similarity.ivfBatchTopK(queries, assigned, centroids,
        "embedding", "vec_id", 5, 5)
      .select("query_id", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // every query got answers, each k-deep or list-limited
    assert(ivf.keySet == exact.keySet)
    val recalls = exact.map { case (q, ex) =>
      (ex & ivf.getOrElse(q, Set.empty)).size.toDouble / ex.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.6, s"mean recall@5 = $mean")
  }

  test("persisted IVF: save/load round trip probes identically, no rebuild") {
    val e = spark.read.parquet(s"${sf()}/embeddings.parquet")
    val q = e.filter(col("vec_id") === 3).head().getSeq[Float](1).toSeq
    val (centroids, assigned) = Similarity.buildIvf(e, "embedding", "vec_id", 16, 64)
    val root = java.nio.file.Files.createTempDirectory("graft_ivf_spec").toString
    Similarity.saveIvf(spark, root, centroids, assigned)
    val index = Similarity.loadIvf(spark, root)
    // centroids survive byte-exact
    assert(index.centroids == centroids)
    // the loaded index's inverted lists are one partition directory each
    assert(index.assigned.numParts == centroids.size)
    // probing the loaded index returns the same rows as the in-memory one
    val mem = Similarity.ivfTopK(assigned, centroids, "embedding", "vec_id", q, 10, 4)
      .select("vec_id").as[Long].collect().toSet
    val disk = Similarity.ivfTopKLake(index, "embedding", "vec_id", q, 10, 4)
      .select("vec_id").as[Long].collect().toSet
    assert(disk == mem)
    // all-lists quantized probe == exact top-k (the gate query's invariant)
    val exact = Similarity.exactTopKQuantized(e, "embedding", "vec_id", q, 10)
      .as[(Long, Long)].collect().toSeq
    val allProbe = Similarity.ivfTopKLake(index, "embedding", "vec_id", q, 10,
      nprobe = 16, quantize = true).as[(Long, Long)].collect().toSeq
    assert(allProbe == exact)
  }

  test("filtered vector search: predicate pre-filters, pushes to the list scans") {
    val e = spark.read.parquet(s"${sf()}/embeddings.parquet")
    val q = e.filter(col("vec_id") === 3).head().getSeq[Float](1).toSeq
    val pred = col("label").isin(2, 7)
    val (centroids, assigned) = Similarity.buildIvf(e, "embedding", "vec_id", 16, 64)
    val root = java.nio.file.Files.createTempDirectory("graft_ivf_filt").toString
    Similarity.saveIvf(spark, root, centroids, assigned)
    val index = Similarity.loadIvf(spark, root)
    // all-lists probe + filter == exact filtered top-k (the gate invariant)
    val exact = Similarity.exactTopKQuantized(
        e.filter(pred), "embedding", "vec_id", q, 10)
      .as[(Long, Long)].collect().toSeq
    val probed = Similarity.ivfTopKLake(index, "embedding", "vec_id", q, 10,
        nprobe = 16, quantize = true, pred = Some(pred))
      .as[(Long, Long)].collect().toSeq
    assert(probed == exact)
    // every survivor satisfies the predicate — pre-filter, not post-filter:
    // a post-filtered unfiltered top-10 would keep only the (few) matching
    // labels among the global winners instead of ranking the survivors
    val labels = e.filter(pred).select("vec_id").as[Long].collect().toSet
    assert(probed.map(_._1).forall(labels))
    assert(probed.size == 10)
    // the predicate reaches the parquet reader of the probed lists
    val plan = Similarity.ivfTopKLake(index, "embedding", "vec_id", q, 10,
        nprobe = 4, quantize = true, pred = Some(pred))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [In(label"), s"filter not pushed:\n$plan")
    // partial probe keeps useful recall under the filter
    val part = Similarity.ivfTopKLake(index, "embedding", "vec_id", q, 10,
        nprobe = 4, quantize = true, pred = Some(pred))
      .select("vec_id").as[Long].collect().toSet
    val recall = (part & exact.map(_._1).toSet).size / 10.0
    assert(recall >= 0.5, s"filtered recall@10 = $recall")
  }

  test("incremental IVF add: new vectors land in their lists, no rebuild, persisted") {
    val e = spark.read.parquet(s"${sf()}/embeddings.parquet")
    val held = e.filter(col("vec_id") < 5)
    val rest = e.filter(col("vec_id") >= 5)
    val (centroids, assigned) = Similarity.buildIvf(rest, "embedding", "vec_id", 16, 64)
    val root = java.nio.file.Files.createTempDirectory("graft_ivf_add").toString
    Similarity.saveIvf(spark, root, centroids, assigned)
    val index = Similarity.loadIvf(spark, root)

    def dirFiles(): Map[String, Set[String]] = {
      import scala.jdk.CollectionConverters._
      index.assigned.partKeys.map { k =>
        val d = java.nio.file.Paths.get(s"$root/assigned/${k.relPath}")
        k.relPath -> java.nio.file.Files.list(d).iterator().asScala
          .map(_.getFileName.toString).toSet
      }.toMap
    }
    val before = dirFiles()

    Similarity.addToIvf(index, held, "embedding")
    // the index was NOT re-clustered
    assert(index.centroids == centroids)
    // an added vector is now findable — self is rank 1 through its own list
    val q = held.filter(col("vec_id") === 3).head().getSeq[Float](1).toSeq
    val top = Similarity.ivfTopKLake(index, "embedding", "vec_id", q, 1, nprobe = 1)
      .select("vec_id").as[Long].head()
    assert(top == 3L)
    // untouched inverted lists keep their files byte-for-byte
    val touched = Similarity.assignToCentroids(held, "embedding", centroids)
      .select("centroid").distinct().as[Int].collect().map(c => s"centroid=$c").toSet
    val after = dirFiles()
    val untouched = before.keySet.filterNot(touched)
    assert(untouched.nonEmpty)
    untouched.foreach(k => assert(after(k) == before(k), s"$k files changed"))
    // and the addition survives a fresh load from disk
    val reloaded = Similarity.loadIvf(spark, root)
    val top2 = Similarity.ivfTopKLake(reloaded, "embedding", "vec_id", q, 1, nprobe = 1)
      .select("vec_id").as[Long].head()
    assert(top2 == 3L)
    // drift monitor: balanced after one tiny add; a pathological pile-up
    // onto one list trips the re-cluster signal
    assert(Similarity.ivfListSizes(index).values.sum == 500L)
    assert(!Similarity.needsRecluster(index))
    val hot = e.limit(1).head().getSeq[Float](1)
    val pile = spark.range(3000).select(col("id").as("vec_id"),
      typedLit(hot).as("embedding"))
    Similarity.addToIvf(index, pile, "embedding")
    assert(Similarity.needsRecluster(index), "3000 identical vectors must skew one list")
  }

  test("IVF remove: ids vanish from probes, untouched lists byte-identical, persisted") {
    val e = spark.read.parquet(s"${sf()}/embeddings.parquet")
      .select("vec_id", "embedding")
    val (centroids, assigned) = Similarity.buildIvf(e, "embedding", "vec_id", 16, 64)
    val root = java.nio.file.Files.createTempDirectory("graft_ivf_rm").toString
    Similarity.saveIvf(spark, root, centroids, assigned)
    val index = Similarity.loadIvf(spark, root)

    def dirFiles(): Map[String, Set[String]] = {
      import scala.jdk.CollectionConverters._
      index.assigned.partKeys.map { k =>
        val d = java.nio.file.Paths.get(s"$root/assigned/${k.relPath}")
        k.relPath -> scala.util.Using.resource(java.nio.file.Files.list(d))(
          _.iterator().asScala.map(_.getFileName.toString).toSet)
      }.toMap
    }
    val before = dirFiles()

    // vec 7 is present before the delete: self-probe hits it
    val q = e.filter(col("vec_id") === 7).head().getSeq[Float](1).toSeq
    val hit = Similarity.ivfTopKLake(index, "embedding", "vec_id", q, 1, nprobe = 1)
      .select("vec_id").as[Long].head()
    assert(hit == 7L)

    val doomed = spark.range(0, 10).select(col("id").as("vec_id"))
    Similarity.removeFromIvf(index, doomed, "vec_id")

    // gone from an ALL-lists probe (not just its own list)
    val all = Similarity.ivfTopKLake(index, "embedding", "vec_id", q, 500,
        nprobe = index.centroids.size)
      .select("vec_id").as[Long].collect().toSet
    assert((all & (0L until 10L).toSet).isEmpty, "removed ids still probed")

    // only the lists that HELD a doomed id rewrote
    val after = dirFiles()
    val touched = before.keySet.filter(k => after(k) != before(k))
    assert(touched.nonEmpty && touched.size < before.size,
      s"expected a strict subset of lists to rewrite, got ${touched.size}/${before.size}")

    // the deletion survives a fresh load from disk
    val reloaded = Similarity.loadIvf(spark, root)
    val all2 = Similarity.ivfTopKLake(reloaded, "embedding", "vec_id", q, 500,
        nprobe = reloaded.centroids.size)
      .select("vec_id").as[Long].collect().toSet
    assert((all2 & (0L until 10L).toSet).isEmpty, "removal lost on reload")

    // removing ids the index never held is a no-op: zero rewrites
    val ghost = spark.range(9000000, 9000050).select(col("id").as("vec_id"))
    Similarity.removeFromIvf(index, ghost, "vec_id")
    assert(dirFiles() == after, "ghost delete must not rewrite any list")
  }

  test("recluster splits the overflowing list; untouched lists byte-identical; probes stay exact") {
    val e = spark.read.parquet(s"${sf()}/embeddings.parquet")
      .select("vec_id", "embedding")
    val (centroids, assigned) = Similarity.buildIvf(e, "embedding", "vec_id", 8, 64)
    val root = java.nio.file.Files.createTempDirectory("graft_ivf_recl").toString
    Similarity.saveIvf(spark, root, centroids, assigned)
    val index = Similarity.loadIvf(spark, root)

    // Skew one list with near-but-DISTINCT vectors (identical vectors are
    // cosine-indistinguishable — no split could separate them).
    val hot = e.limit(1).head().getSeq[Float](1)
    val pile = spark.range(1000000, 1003000).select(col("id").as("vec_id"),
      transform(typedLit(hot), (x, i) =>
        (x + when(i === 0, (col("id") % 97).cast("float") / lit(50.0f))
          .otherwise(lit(0.0f))).cast("float")).as("embedding"))
    Similarity.addToIvf(index, pile, "embedding")
    assert(Similarity.needsRecluster(index), "the pile must skew one list")
    val sizesBefore = Similarity.ivfListSizes(index)
    val overflowing = sizesBefore.filter(_._2 > 4.0 *
      sizesBefore.values.sum / index.centroids.size).keys.map(c => s"centroid=$c").toSet

    def dirFiles(): Map[String, Set[String]] = {
      import scala.jdk.CollectionConverters._
      index.assigned.partKeys.map { k =>
        val d = java.nio.file.Paths.get(s"$root/assigned/${k.relPath}")
        k.relPath -> scala.util.Using.resource(java.nio.file.Files.list(d))(
          _.iterator().asScala.map(_.getFileName.toString).toSet)
      }.toMap
    }
    val before = dirFiles()

    val re = Similarity.reclusterOverflowing(root, index, "embedding", "vec_id")
    // the monitor stands down and the split lists actually shrank
    val sizesAfter = Similarity.ivfListSizes(re)
    assert(sizesAfter.values.max < sizesBefore.values.max,
      s"before=$sizesBefore after=$sizesAfter")
    assert(!Similarity.needsRecluster(re), s"after=$sizesAfter")
    assert(sizesAfter.values.sum == sizesBefore.values.sum)
    // untouched lists keep their files byte-for-byte
    val after = dirFiles()
    val untouched = before.keySet.filterNot(overflowing)
    assert(untouched.nonEmpty)
    untouched.foreach(k => assert(after(k) == before(k), s"$k files changed"))
    assert(overflowing.forall(k => !after.contains(k)), "split dirs must be gone")

    // probing every list still reproduces the EXACT top-k over the full
    // corpus — the split moved rows, never lost or duplicated them
    val full = e.unionByName(pile)
    val q = e.filter(col("vec_id") === 3).head().getSeq[Float](1).toSeq
    val exact = Similarity.exactTopKQuantized(full, "embedding", "vec_id", q, 10)
      .as[(Long, Long)].collect().toSeq
    val allProbe = Similarity.ivfTopKLake(re, "embedding", "vec_id", q, 10,
      nprobe = re.centroids.size, quantize = true).as[(Long, Long)].collect().toSeq
    assert(allProbe == exact)

    // a fresh load from disk sees the post-split layout
    val reloaded = Similarity.loadIvf(spark, root)
    assert(reloaded.centroids == re.centroids)
    assert(reloaded.assigned.numParts == re.assigned.numParts)
  }

  // ------------------------------------------------------------------ joins

  test("salted join equals plain join on skewed data") {
    import graft.operators.Joins
    // heavily skewed: 90% of rows share key 1
    val big = spark.range(0, 2000)
      .selectExpr("IF(id % 10 = 0, id, 1) AS key", "id AS payload")
    val small = Seq((1L, "hot"), (10L, "a"), (20L, "b")).toDF("key", "tag")
    val plain = big.join(small, "key")
    val salted = Joins.saltedJoin(big, small, "key", factor = 8, saltSource = col("payload"))
    assert(salted.count() == plain.count())
    val a = plain.agg(sum("payload")).head().getLong(0)
    val b = salted.agg(sum("payload")).head().getLong(0)
    assert(a == b)
  }

  test("coLocatedJoin matches the plain join; null keys drop; guards fire") {
    import graft.lake.LakeDataset
    import graft.operators.Joins
    val l = Seq((1L, "a"), (2L, "b"), (7L, "c"), (12L, "d"))
      .toDF("k", "lv")
      .unionByName(Seq((Option.empty[Long], "nul")).toDF("k", "lv"))
    val r = Seq((1L, 10.0), (7L, 70.0), (99L, 990.0)).toDF("k", "rv")
    val dl = LakeDataset.fromDataFrame(spark, l, bucketCols = Seq("k"), nBuckets = 5)
    val dr = LakeDataset.fromDataFrame(spark, r, bucketCols = Seq("k"), nBuckets = 5)
    val got = Joins.coLocatedJoin(dl, dr, "k", "k")
      .select("k", "lv", "rv").collect().map(_.toSeq).toSet
    val want = l.join(r, Seq("k")).select("k", "lv", "rv").collect().map(_.toSeq).toSet
    assert(got === want && got.size === 2)
    val dr3 = LakeDataset.fromDataFrame(spark, r, bucketCols = Seq("k"), nBuckets = 3)
    intercept[IllegalArgumentException](Joins.coLocatedJoin(dl, dr3, "k", "k"))
    intercept[IllegalArgumentException](Joins.coLocatedJoin(dl, dr, "lv", "k"))
  }

  test("rangeJoin equals the naive inequality join across bin boundaries") {
    import graft.operators.Joins
    val pts = (0L to 100L).map(v => (v % 3, v.toDouble)).toDF("k", "x")
    val iv = Seq((0L, 1L, -5.0, 3.0), (1L, 2L, 10.0, 47.0), (2L, 3L, 90.0, 200.0),
      (0L, 4L, 31.9, 32.1), (1L, 5L, 200.0, 300.0))
      .toDF("k", "iid", "lo", "hi")
    val got = Joins.rangeJoin(pts, "x", iv, "lo", "hi", keys = Seq("k"), binSize = 16L)
      .select("k", "iid", "x").collect().map(_.toSeq).toSet
    val want = pts.join(iv, Seq("k"))
      .filter(col("x").between(col("lo"), col("hi")))
      .select("k", "iid", "x").collect().map(_.toSeq).toSet
    assert(got == want && got.nonEmpty)
  }

  test("asofJoin: latest at-or-before snapshot, ties, no-snapshot nulls, row-atomicity") {
    import graft.operators.Joins
    val events = Seq((1L, 10L, "a"), (1L, 20L, "b"), (1L, 35L, "c"), (2L, 5L, "d"))
      .toDF("uid", "ts", "tag")
    val snaps = Seq(
      (1L, 10L, Some(100.0), Some("x")), // ties with event at ts=10 -> qualifies
      (1L, 30L, None, Some("y")),        // genuine NULL field must NOT stitch
      (3L, 1L, Some(9.0), Some("z")))    // other key only
      .toDF("uid", "sts", "budget", "label")
    val got = Joins.asofJoin(events, snaps, Seq("uid"), "ts", "sts", Seq("budget", "label"))
      .orderBy("uid", "ts")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        Option(r.get(3)), Option(r.get(4)))).toSeq
    assert(got == Seq(
      (1L, 10L, "a", Some(100.0), Some("x")), // snapshot AT event time
      (1L, 20L, "b", Some(100.0), Some("x")),
      (1L, 35L, "c", None, Some("y")),        // row-atomic: budget really NULL
      (2L, 5L, "d", None, None)))             // no snapshot for uid 2
  }

  test("asofJoin forward + tolerance: polars parity semantics") {
    import graft.operators.Joins
    val events = Seq((1L, 10L, "a"), (1L, 20L, "b"), (1L, 35L, "c"))
      .toDF("uid", "ts", "tag")
    val snaps = Seq((1L, 20L, 200.0), (1L, 30L, 300.0))
      .toDF("uid", "sts", "budget")
    // forward: EARLIEST snapshot at-or-after; equal ts qualifies
    val fwd = Joins.asofJoin(events, snaps, Seq("uid"), "ts", "sts",
        Seq("budget"), strategy = "forward")
      .orderBy("ts").collect()
      .map(r => (r.getLong(1), Option(r.get(3)))).toSeq
    assert(fwd == Seq((10L, Some(200.0)), (20L, Some(200.0)), (35L, None)))
    // tolerance: a nearest-preceding match farther than 10 nulls out
    val tol = Joins.asofJoin(events, snaps, Seq("uid"), "ts", "sts",
        Seq("budget"), tolerance = Some(lit(10L)))
      .orderBy("ts").collect()
      .map(r => (r.getLong(1), Option(r.get(3)))).toSeq
    // ts=10: no preceding; ts=20: snap 20, diff 0 <= 10; ts=35: snap 30, diff 5
    assert(tol == Seq((10L, None), (20L, Some(200.0)), (35L, Some(300.0))))
    val tolTight = Joins.asofJoin(events, snaps, Seq("uid"), "ts", "sts",
        Seq("budget"), tolerance = Some(lit(3L)))
      .orderBy("ts").collect()
      .map(r => (r.getLong(1), Option(r.get(3)))).toSeq
    assert(tolTight == Seq((10L, None), (20L, Some(200.0)), (35L, None)))
    // nearest: closer side wins; equal-distance ties go backward
    val near = Joins.asofJoin(events, snaps, Seq("uid"), "ts", "sts",
        Seq("budget"), strategy = "nearest")
      .orderBy("ts").collect()
      .map(r => (r.getLong(1), Option(r.get(3)))).toSeq
    // ts=10: only following (20) -> 200; ts=20: exact hit -> 200;
    // ts=35: preceding 30 (d=5), no following -> 300
    assert(near == Seq((10L, Some(200.0)), (20L, Some(200.0)), (35L, Some(300.0))))
    val tie = Joins.asofJoin(Seq((1L, 25L, "t")).toDF("uid", "ts", "tag"),
        snaps, Seq("uid"), "ts", "sts", Seq("budget"), strategy = "nearest")
      .collect().map(r => Option(r.get(3))).toSeq
    assert(tie == Seq(Some(200.0)), "equidistant tie must choose backward")
  }

  // ------------------------------------------------------------------- text

  test("token count: empty, single, multi") {
    val df = Seq("", "one", "one two three", "  padded  words  ").toDF("t")
    val got = df.select(TextAnalysis.tokenCount(col("t")).as("n")).as[Long].collect().toSeq
    // "padded  words" has a double space -> naive count 3; deterministic + documented
    assert(got == Seq(0L, 1L, 3L, 3L))
  }

  test("char-trigram langId classifies obvious sentences") {
    val df = Seq(
      "the thing and the other thing going along",
      "ich bin ein berliner und der hund schlaeft",
      "le chat est dans les champs avec que des souris",
      "zz qq xx").toDF("t")
    val got = df.select(TextAnalysis.langIdNgram(col("t"))).as[String].collect().toSeq
    assert(got == Seq("en", "de", "fr", "und"))
  }

  test("langId picks marker-dominant language deterministically") {
    val df = Seq(
      "the cat and the dog is on the mat",
      "der hund und die katze ist nicht da",
      "le chat et la souris est dans les champs",
      "xyzzy qwerty").toDF("t")
    val got = df.select(TextAnalysis.langId(col("t"))).as[String].collect().toSeq
    assert(got == Seq("en", "de", "fr", "und"))
  }

  test("connected components: chains group transitively, singleton pairs keep min id") {
    import graft.operators.Dedup
    // 1-2-3-4 is a CHAIN (no direct 1-4 pair), 10-11 a pair, 20-21-22 a
    // triangle: components must be {1,2,3,4}->1, {10,11}->10, {20,21,22}->20.
    val pairs = Seq(
      (2L, 1L), (2L, 3L), (3L, 4L),
      (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L))
      .toDF("doc_a", "doc_b")
    val got = Dedup.connectedComponents(pairs, "doc_a", "doc_b")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L), s"got $got")
    // The DISTRIBUTED path (cap forced to 0) must agree exactly, and a
    // LONG chain (diameter 12) exercises the snapshot-every-3-rounds
    // lineage cut, not just the 2-round easy case.
    spark.conf.set("spark.graft.dedup.driverEdgeCap", "0")
    try {
      val distGot = Dedup.connectedComponents(pairs, "doc_a", "doc_b")
        .as[(Long, Long)].collect().toMap
      assert(distGot == got, s"distributed path diverged: $distGot")
      val chain = (0L until 12L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
      val longGot = Dedup.connectedComponents(chain, "doc_a", "doc_b")
        .as[(Long, Long)].collect().toMap
      assert(longGot.values.toSet == Set(0L) && longGot.size == 13)
    } finally spark.conf.unset("spark.graft.dedup.driverEdgeCap")
  }

  test("decontamination flags benchmark-overlapping docs, clean docs pass") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "completely unrelated text about spark engines here"),
      (3L, "quick brown fox appears in this training document too"))
      .toDF("doc_id", "text")
    val bench = Seq((100L, "the quick brown fox jumps high")).toDF("doc_id", "text")
    val out = graft.operators.Dedup.decontaminate(docs, bench, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // doc 1 shares 3 trigrams with the bench sentence, doc 3 shares 1,
    // doc 2 none (and is therefore absent, not zero-scored).
    assert(out.keySet == Set(1L, 3L))
    assert(out(1L)._1 == 3L, s"doc1: ${out(1L)}")
    assert(out(3L)._1 == 1L, s"doc3: ${out(3L)}")
    // total_grams is the doc's own distinct trigram count (9-word doc -> 7)
    assert(out(1L)._2 == 7L)
  }

  test("sequence packing: contiguous id-order packs per shard, budget honored at starts") {
    // One shard (nShards=1), budget 10: token counts 4,4,4,4 -> start
    // offsets 0,4,8,12 -> packs 0,0,0,1 (a doc belongs to the pack its
    // offset STARTS in; doc 3 starts at 8 < 10 so it stays in pack 0).
    val docs = Seq(
      (1L, "a b c d"), (2L, "e f g h"), (3L, "i j k l"), (4L, "m n o p"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.packSequences(docs, "text", "doc_id",
        budgetTokens = 10, nShards = 1)
      .orderBy("doc_id").as[(Long, Int, Long, Long)].collect().toSeq
    assert(out.map(_._3) == Seq(4L, 4L, 4L, 4L))
    assert(out.map(_._4) == Seq(0L, 0L, 0L, 1L), s"packs: $out")
    // Sharded: packs are disjoint across shards (global uniqueness via the
    // shard * 2^32 offset) and ids within a pack share the shard.
    val sharded = TextAnalysis.packSequences(docs, "text", "doc_id",
        budgetTokens = 10, nShards = 2)
      .as[(Long, Int, Long, Long)].collect().toSeq
    assert(sharded.groupBy(_._4).forall(_._2.map(_._2).distinct.sizeIs == 1))
    assert(sharded.filter(_._2 == 0).map(_._4).forall(_ < (1L << 32)))
    assert(sharded.filter(_._2 == 1).map(_._4).forall(_ >= (1L << 32)))
  }

  test("phash near-dups: chunk bucketing is complete; planted pairs recovered") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val corpus = docs.select(col("doc_id"), col("text"))
      .unionByName(docs.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 50000L).as("doc_id"),
          translate(col("text"), "a", "o").as("text")))
    val media = Multimodal.mediaFromDocuments(corpus).as[Multimodal.MediaRow]
    val bucketed = Multimodal.phashNearDups(media, maxHamming = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // brute-force ground truth over the collected hashes
    val hs = media.collect().map(r => r.media_id -> Multimodal.perceptualHash(r.payload))
    val brute = (for {
      (ia, ha) <- hs; (ib, hb) <- hs
      if ia < ib && java.lang.Long.bitCount(ha ^ hb) <= 3
    } yield (ia, ib)).toSet
    assert(bucketed == brute,
      s"bucketing must be complete to hamming 3: ${brute.diff(bucketed)} missed")
    // translate(a->o) shifts many window means: not all plants survive at
    // hamming<=3, but exact copies always do (docs with no 'a')
    val planted = bucketed.count { case (a, b) => b - a == 50000L }
    assert(planted >= 1, "at least the byte-identical plants must pair")
    // hamming is symmetric-free output: a < b always
    assert(bucketed.forall { case (a, b) => a < b })
    // a monotone byte ramp sets every gradient bit; its reverse sets none
    val ramp = Array.tabulate(330)(i => (i % 128).toByte)
    assert(Multimodal.perceptualHash(Array.tabulate(330)(i => (i / 10).toByte))
      == 0xFFFFFFFFL)
    assert(Multimodal.perceptualHash(
      Array.tabulate(330)(i => ((329 - i) / 10).toByte)) == 0L)
    assert(ramp.length == 330) // keep the fixture honest
  }

  test("importance contrast selects target-domain-like documents") {
    // Tiny planted corpus: target speaks "alpha", the rest speaks "beta".
    // alpha: rate_t = (4*1M) div 4 = 1M; rate_r = (4*1M) div 12 = 333333.
    // beta: rate_t = 0; rate_r = (8*1M) div 12 = 666666.
    val docs = Seq(
      (1L, "alpha alpha", "tgt"), (2L, "alpha alpha", "tgt"),
      (3L, "beta beta", "raw"), (4L, "beta beta", "raw"),
      (5L, "beta beta", "raw"), (6L, "beta beta", "raw"))
      .toDF("doc_id", "text", "dom")
    val scored = TextAnalysis.importanceContrast(
      docs, docs.filter(col("dom") === "tgt"), "text", "doc_id")
      .orderBy("doc").as[(Long, Long, Long)].collect().toSeq
    // alpha docs: 2 * (1000000 - 333333) = 1333334; beta: 2 * (0 - 666666)
    assert(scored.filter(_._1 <= 2).forall(_._2 == 1333334L), scored.toString)
    assert(scored.filter(_._1 >= 3).forall(_._2 == -1333332L), scored.toString)
    val picked = TextAnalysis.importanceSelect(
      TextAnalysis.importanceContrast(
        docs, docs.filter(col("dom") === "tgt"), "text", "doc_id"), 2)
      .select("doc").as[Long].collect().toSet
    assert(picked == Set(1L, 2L))
    // Corpus-scale property. The synthetic corpus shares ONE 31-word
    // vocabulary across languages (lang is metadata, not a distribution
    // shift — the same quirk the SimHash twin hit), so the target must be
    // content-distinct: plant 50 docs salted with domain tokens, target
    // them, and the selection must recover them.
    val corpus = spark.read.parquet(s"${sf()}/documents.parquet")
    val planted = corpus.filter(col("doc_id") < 50)
      .select((col("doc_id") + 100000L).as("doc_id"),
        concat(col("text"), lit(" graftium graftium lakeium" * 4)).as("text"))
    val mixed = corpus.select("doc_id", "text").unionByName(planted)
    val sel = TextAnalysis.importanceSelect(TextAnalysis.importanceContrast(
        mixed, planted, "text", "doc_id"), 50)
      .select("doc").as[Long].collect().toSet
    val recovered = sel.count(_ >= 100000L) / 50.0
    assert(recovered >= 0.9, s"planted-domain recovery: $recovered")
  }

  test("chunking: full coverage, fixed overlap, short tail, no shuffle") {
    // 10 words, chunkSize 4, stride 3 -> starts 0,3,6,9: four chunks, the
    // last one word long. Every word covered; consecutive chunks share 1.
    val docs = Seq((7L, "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9")).toDF("doc_id", "text")
    val out = TextAnalysis.chunkWords(docs, "text", "doc_id", 4, 3)
      .orderBy("chunk_id").as[(Long, Long, String, Long)].collect().toSeq
    assert(out.map(_._3) == Seq(
      "w0 w1 w2 w3", "w3 w4 w5 w6", "w6 w7 w8 w9", "w9"))
    assert(out.map(_._4) == Seq(4L, 4L, 4L, 1L))
    // Stride-prefixes concatenated reconstruct the document exactly.
    val rebuilt = out.map(c => c._3.split(" ").take(3)).flatten.take(10)
    assert(rebuilt.mkString(" ") == "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9")
    // Corpus shape: the gate parameters cover every word of every doc and
    // the operator plans as a narrow map (no exchange before the explode).
    val corpus = spark.read.parquet(s"${sf()}/documents.parquet")
    val chunks = TextAnalysis.chunkWords(corpus, "text", "doc_id", 32, 24)
    val plan = chunks.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunking shuffled:\n$plan")
    val covered = chunks.groupBy("doc")
      .agg(max(col("chunk_id") * 24 + col("n_words")).as("cov"))
    val words = corpus.select(col("doc_id").as("doc"),
      size(split(trim(col("text")), " ")).cast("long").as("n"))
    assert(covered.join(words, "doc").filter(col("cov") =!= col("n")).count() == 0)
  }

  test("pii scrub redacts emails and phones with per-doc counts") {
    val docs = Seq(
      (1L, "reach me at alice@example.org or 555-123-4567 thanks"),
      (2L, "no pii here at all"),
      (3L, "two mails a@b.co c.d@e.io and 111.222.3333"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.piiScrub(docs, "text", "doc_id").orderBy("doc_id")
      .as[(Long, String, Long)].collect().toSeq
    assert(out(0)._2 == "reach me at <EMAIL> or <PHONE> thanks")
    assert(out(0)._3 == 2L)
    assert(out(1)._2 == "no pii here at all" && out(1)._3 == 0L)
    assert(out(2)._2 == "two mails <EMAIL> <EMAIL> and <PHONE>")
    assert(out(2)._3 == 3L)
  }

  test("tf-idf: corpus-wide common terms rank below distinctive terms") {
    import graft.operators.TextAnalysis
    val df = Seq(
      (1L, "common common unicorn common"),
      (2L, "common stuff here"),
      (3L, "common other words")).toDF("id", "text")
    val top = TextAnalysis.tfIdfTopTerms(df, "text", "id", k = 1)
      .filter(col("doc") === 1L).select("w").as[String].head()
    // "common" appears in every doc (idf=0); "unicorn" only in doc 1
    assert(top == "unicorn")
  }

  test("winnowing: near-dup docs share most fingerprints, unrelated docs few") {
    import graft.operators.TextAnalysis
    val fps = TextAnalysis.winnowFingerprints(
      Fixtures.nearDupDocuments(spark, sf()), "text", "doc_id")
      .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def overlap(a: Long, b: Long): Double = {
      val (fa, fb) = (fps(a), fps(b))
      (fa & fb).size.toDouble / math.min(fa.size, fb.size)
    }
    // planted near-dup (same text + short suffix) must share ~all fingerprints
    assert(overlap(0L, 100000L) > 0.8, s"planted overlap: ${overlap(0L, 100000L)}")
    // unrelated docs share few
    assert(overlap(1L, 2L) < 0.5, s"unrelated overlap: ${overlap(1L, 2L)}")
  }

  test("winnowing int twin: same guarantees, hashes bounded by the modulus") {
    import graft.operators.TextAnalysis
    val fps = TextAnalysis.winnowFingerprintsInt(
      Fixtures.nearDupDocuments(spark, sf()), "text", "doc_id")
      .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def overlap(a: Long, b: Long): Double = {
      val (fa, fb) = (fps(a), fps(b))
      (fa & fb).size.toDouble / math.min(fa.size, fb.size)
    }
    assert(overlap(0L, 100000L) > 0.8, s"planted overlap: ${overlap(0L, 100000L)}")
    assert(overlap(1L, 2L) < 0.5, s"unrelated overlap: ${overlap(1L, 2L)}")
    // every fingerprint is a valid modular-polynomial residue
    assert(fps.values.flatten.forall(h => h >= 0L && h < 2147483647L))
  }

  test("fingerprint is normalization-invariant") {
    val df = Seq(("Hello,  World!", "hello world")).toDF("a", "b")
    val r = df.select(
      TextAnalysis.fingerprint(col("a")).as("fa"),
      TextAnalysis.fingerprint(col("b")).as("fb")).head()
    assert(r.getLong(0) == r.getLong(1))
  }

  // ------------------------------------------------------------- multimodal

  test("multimodal feature extraction: deterministic, fixed dim, partition-local") {
    val media = Multimodal.mediaFromDocuments(
      spark.read.parquet(s"${sf()}/documents.parquet")).as[Multimodal.MediaRow]
    val f1 = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(media.repartition(7)).collect().sortBy(_.media_id)
    assert(f1.length == 500)
    assert(f1.forall(_.feature.length == Multimodal.FeatureDim))
    // partitioning must not change results
    assert(f1.zip(f2).forall { case (a, b) => a.feature.sameElements(b.feature) })
  }

  test("resize stub subsamples deterministically to the target size") {
    val media = Multimodal.mediaFromDocuments(
      spark.read.parquet(s"${sf()}/documents.parquet")).as[Multimodal.MediaRow]
    val resized = Multimodal.resizeStub(media, targetBytes = 32).collect()
    assert(resized.forall(_.payload.length <= 32))
    assert(resized.forall(_.format.endsWith(";resized")))
    val again = Multimodal.resizeStub(media, targetBytes = 32).collect()
    assert(resized.sortBy(_.media_id).zip(again.sortBy(_.media_id))
      .forall { case (a, b) => a.payload.sameElements(b.payload) })
  }

  test("frame sampling yields n frames of bounded size") {
    val media = Multimodal.mediaFromDocuments(
      spark.read.parquet(s"${sf()}/documents.parquet")).as[Multimodal.MediaRow]
    val frames = Multimodal.sampleFrames(media, n = 4)
    assert(frames.count() == 4 * 500)
    val maxLen = frames.select(max(length(col("frame")))).head().getInt(0)
    assert(maxLen <= 32)
  }
}
