package graft

import graft.operators.{Pq, Similarity}
import org.apache.spark.sql.functions._

class PqSpec extends SparkSpec {

  private lazy val emb = Fixtures.table(spark, sf(), "embeddings")
  // m=16 (dsub=4): isotropic random vectors carry no cluster structure, so
  // recall comes from subspace COUNT, not per-subspace centroid count —
  // quantization error per subspace is bounded by its dimensionality.
  private lazy val model = Pq.train(emb, "embedding", "vec_id", dim = 64,
    m = 16, ksub = 256, iters = 6, sampleSize = 2048)
  private lazy val query: Seq[Float] =
    emb.filter(col("vec_id") === 0).head().getSeq[Float](1).toSeq

  test("codes are m bytes; encode is deterministic across plans") {
    val a = Pq.encode(emb, "embedding", model).select("vec_id", "pq_code")
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    val b = Pq.encode(emb.repartition(7), "embedding", model)
      .select("vec_id", "pq_code")
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    assert(a.values.forall(_.length == model.m), "one byte per subspace")
    assert(a == b, "partitioning must not change codes")
  }

  test("adc score equals the local model for every row") {
    val lut = Pq.lutFor(model, query)
    val rows = Pq.encode(emb, "embedding", model)
      .select(col("vec_id"),
        graft.functions.PqAdcDot(col("pq_code"), lut).as("adc"),
        col("pq_code"))
      .collect()
    rows.foreach { r =>
      val code = r.getAs[Array[Byte]](2)
      val want = code.zipWithIndex.map { case (c, j) => lut(j)(c & 0xFF) }.sum
      assert(math.abs(r.getDouble(1) - want) < 1e-12, s"vec ${r.getLong(0)}")
    }
  }

  test("dirty vectors encode without throwing: zero, short, long") {
    import spark.implicits._
    val dirty = Seq(
      (1L, Array.fill(64)(0.0f)),          // zero vector
      (2L, Array.fill(10)(1.0f)),          // shorter than trained dim
      (3L, Array.fill(100)(0.5f)))         // longer than trained dim
      .toDF("vec_id", "embedding")
    val out = Pq.encode(dirty, "embedding", model).select("pq_code").collect()
    assert(out.forall(_.getAs[Array[Byte]](0).length == model.m))
  }

  test("ADC top-k recalls most of the exact top-k; rerank recovers it exactly") {
    val encoded = Pq.encode(emb, "embedding", model)
    val exact = Similarity.exactTopKQuantized(emb, "embedding", "vec_id", query, 10)
      .collect().map(_.getLong(0)).toSet
    val adc = Pq.adcTopK(encoded, "vec_id", model, query, 10)
      .collect().map(_.getLong(0)).toSet
    val recall = (adc & exact).size / 10.0
    assert(recall >= 0.5, s"ADC recall@10 = $recall")
    // two-stage: ADC 100 candidates + exact rerank == exact top-k, row for row
    val rr = Pq.rerankTopK(encoded, "embedding", "vec_id", model, query,
      k = 10, refine = 10).collect().toSeq
    val ex = Similarity.exactTopKQuantized(emb, "embedding", "vec_id", query, 10)
      .collect().toSeq
    assert(rr == ex, s"rerank diverged:\n$rr\n$ex")
  }

  test("ivf-pq: codes live in the lists, probes prune, all-lists rerank == exact") {
    val root = java.nio.file.Files.createTempDirectory("graft_ivfpq").toString
    try {
      val (c, a) = Similarity.buildIvf(emb, "embedding", "vec_id", 8, 64)
      Similarity.saveIvf(spark, root, c, a)
      val index = Similarity.loadIvf(spark, root)
      val lists = Pq.encodeIvfLists(spark, root, index, model, "embedding")

      // all-lists probe + rerank reproduces the exact top-k
      val got = Pq.ivfPqTopK(lists, index.centroids, model, "embedding",
        "vec_id", query, k = 10, nprobe = index.centroids.size).collect().toSeq
      val exact = Similarity.exactTopKQuantized(
        emb, "embedding", "vec_id", query, 10).collect().toSeq
      assert(got == exact)

      // nprobe=2 plans exactly the two probed list directories
      val pruned = Pq.ivfPqTopK(lists, index.centroids, model, "embedding",
        "vec_id", query, k = 10, nprobe = 2)
      val leaves = pruned.queryExecution.optimizedPlan.collectLeaves().size
      assert(leaves == 2, pruned.queryExecution.optimizedPlan.treeString)

      // the model travels with the lists: a fresh session-less reload scores
      // identically
      val back = Pq.load(s"$root/assigned_pq")
      val again = Pq.ivfPqTopK(lists, index.centroids, back, "embedding",
        "vec_id", query, k = 10, nprobe = index.centroids.size).collect().toSeq
      assert(again == exact)
    } finally graft.lake.LakeDataset.deleteRecursively(java.nio.file.Paths.get(root))
  }

  test("save/load round trip reproduces codes bit for bit") {
    val root = java.nio.file.Files.createTempDirectory("graft_pq").toString
    try {
      Pq.save(model, root)
      val back = Pq.load(root)
      assert(back.m == model.m && back.dsub == model.dsub)
      val a = Pq.encode(emb, "embedding", model).select("vec_id", "pq_code")
        .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
      val b = Pq.encode(emb, "embedding", back).select("vec_id", "pq_code")
        .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
      assert(a == b)
    } finally graft.lake.LakeDataset.deleteRecursively(java.nio.file.Paths.get(root))
  }
}
