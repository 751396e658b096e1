package graft.operators

import com.fasterxml.jackson.databind.ObjectMapper
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{PqAdcDot, PqEncode}

/** Product quantization for the ANN stack — the compression half of the
  * IVF-PQ design billion-scale vector search runs on: vectors become `m`
  * one-byte codes (64-dim float = 256 B -> 8 B, 32x), and query scans read
  * ONLY the code column with `m` lookup-table adds per row
  * ([[graft.functions.PqAdcDot]]). At 100 TB of embeddings the difference
  * is scanning 3 TB of codes instead of the full vector store — and the
  * codes column rides every existing lake mechanism (parquet, zone maps,
  * partition pruning) like any other column.
  *
  * Everything operates on DIRECTION (inputs are L2-normalized inside encode
  * and LUT construction), so the ADC sum approximates cosine directly.
  * Training is a bounded driver-side sample (hash-ordered, deterministic) —
  * the corpus-side cost is ONE codegen'd encode pass; no distributed
  * k-means iterations (same rationale as [[Similarity.buildIvf]]).
  *
  * Accuracy contract: ADC ranking is approximate; [[rerankTopK]] re-scores
  * the ADC top `k*refine` candidates with the exact quantized cosine of
  * [[Similarity.exactTopKQuantized]], the standard two-stage recall
  * recovery (candidates shrink 100x before any full vector is touched).
  */
object Pq {

  /** Trained codebooks: `codebooks(j)(c)` is sub-centroid c of subspace j
    * (over normalized input vectors); `dsub` elements each.
    */
  final case class PqModel(codebooks: Array[Array[Array[Double]]]) {
    def m: Int = codebooks.length
    def dsub: Int = codebooks(0)(0).length
    def dim: Int = m * dsub
  }

  /** Deterministic hash-ordered sample of normalized vectors. */
  private def sampleNormalized(
      df: DataFrame, vecCol: String, idCol: String, n: Int): Array[Array[Double]] = {
    val rows = df
      .orderBy(pmod(xxhash64(col(idCol)), lit(999983L)), col(idCol))
      .select(col(vecCol)).limit(n).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    require(rows.nonEmpty, "cannot train PQ on an empty table")
    rows.map(normalize)
  }

  private def normalize(v: Array[Double]): Array[Double] = {
    var ss = 0.0; var i = 0
    while (i < v.length) { ss += v(i) * v(i); i += 1 }
    val n = math.sqrt(ss)
    if (n == 0.0) v else v.map(_ / n)
  }

  /** Local L2 k-means over one subspace's sample. Seeds are the first
    * `ksub` DISTINCT subvectors in sample order (deterministic); empty
    * clusters keep their centroid.
    */
  private def kmeansSub(
      sub: Array[Array[Double]], ksub: Int, iters: Int): Array[Array[Double]] = {
    val seeds = scala.collection.mutable.ArrayBuffer[Array[Double]]()
    val seen = scala.collection.mutable.HashSet[Seq[Double]]()
    var i = 0
    while (i < sub.length && seeds.length < ksub) {
      if (seen.add(sub(i).toSeq)) seeds += sub(i).clone()
      i += 1
    }
    var cents = seeds.toArray
    val dsub = sub(0).length
    var it = 0
    while (it < iters) {
      val sums = Array.fill(cents.length)(new Array[Double](dsub))
      val counts = new Array[Long](cents.length)
      sub.foreach { v =>
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < cents.length) {
          var d = 0.0; var e = 0
          while (e < dsub) { val x = v(e) - cents(c)(e); d += x * x; e += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        counts(best) += 1
        var e = 0
        while (e < dsub) { sums(best)(e) += v(e); e += 1 }
      }
      cents = cents.indices.map { c =>
        if (counts(c) == 0L) cents(c) else sums(c).map(_ / counts(c))
      }.toArray
      it += 1
    }
    cents
  }

  /** Train `m` per-subspace codebooks of up to `ksub` sub-centroids from a
    * bounded sample. `dim` must be divisible by `m`.
    */
  def train(
      df: DataFrame, vecCol: String, idCol: String, dim: Int,
      m: Int = 8, ksub: Int = 256, iters: Int = 8,
      sampleSize: Int = 8192): PqModel = {
    require(dim % m == 0, s"dim=$dim not divisible by m=$m subspaces")
    require(ksub >= 1 && ksub <= 256, "1..256 sub-centroids (one byte)")
    val dsub = dim / m
    val sample = sampleNormalized(df, vecCol, idCol, sampleSize)
    val codebooks = (0 until m).map { j =>
      val sub = sample.map { v =>
        Array.tabulate(dsub)(e =>
          if (j * dsub + e < v.length) v(j * dsub + e) else 0.0)
      }
      kmeansSub(sub, ksub, iters)
    }.toArray
    PqModel(codebooks)
  }

  /** Append the PQ code column — ONE codegen'd pass, the only corpus-side
    * cost of the index. L2 normalization happens inside [[PqEncode]]
    * itself (a composed HOF normalization would run interpreted on the one
    * pass that touches every vector).
    */
  def encode(df: DataFrame, vecCol: String, model: PqModel,
      codeCol: String = "pq_code"): DataFrame =
    df.withColumn(codeCol, PqEncode(col(vecCol), model.codebooks))

  /** ADC lookup table for `query`: `lut(j)(c) = dot(q_j, codebook_j(c))`
    * over the NORMALIZED query — driver-side, m*ksub*dsub flops.
    */
  def lutFor(model: PqModel, query: Seq[Float]): Array[Array[Double]] = {
    val q = normalize(query.map(_.toDouble).toArray)
    model.codebooks.zipWithIndex.map { case (cb, j) =>
      cb.map { cent =>
        var d = 0.0; var e = 0
        while (e < cent.length) {
          val qi = j * model.dsub + e
          if (qi < q.length) d += q(qi) * cent(e)
          e += 1
        }
        d
      }
    }
  }

  /** Approximate top-k by ADC score alone — never touches a vector.
    * `pred` is a metadata PRE-filter applied before scoring (the same
    * filtered-search seam as [[Sq.sq8TopK]] / `ivfTopKLake(pred=)`).
    */
  def adcTopK(encoded: DataFrame, idCol: String, model: PqModel,
      query: Seq[Float], k: Int, codeCol: String = "pq_code",
      pred: Option[org.apache.spark.sql.Column] = None): DataFrame =
    pred.map(encoded.filter).getOrElse(encoded)
      .select(col(idCol), PqAdcDot(col(codeCol), lutFor(model, query)).as("adc"))
      .orderBy(desc("adc"), col(idCol))
      .limit(k)

  /** Two-stage search: ADC narrows to `k*refine` candidates, exact
    * quantized cosine (the [[Similarity.exactTopKQuantized]] grid) ranks
    * the winners — output schema matches the exact operator, so recall
    * recovery is oracle-checkable against it.
    */
  def rerankTopK(encoded: DataFrame, vecCol: String, idCol: String,
      model: PqModel, query: Seq[Float], k: Int, refine: Int = 10,
      codeCol: String = "pq_code",
      pred: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    val qLit = array(query.map(q => lit(q.toDouble)): _*)
    pred.map(encoded.filter).getOrElse(encoded)
      .select(col(idCol), col(vecCol),
        PqAdcDot(col(codeCol), lutFor(model, query)).as("adc"))
      .orderBy(desc("adc"), col(idCol))
      .limit(k * refine)
      .select(col(idCol),
        round(Similarity.cosineHof(col(vecCol), qLit) * 1000000)
          .cast("long").as("cos_q"))
      .orderBy(desc("cos_q"), col(idCol))
      .limit(k)
  }

  // ----------------------------------------------------------------- IVF+PQ

  /** Materialize PQ codes INSIDE the inverted lists of a persisted IVF
    * index ([[Similarity.IvfLake]]): a second centroid-partitioned lake
    * under `root/assigned_pq` whose rows carry the code column. This is the
    * full IVF-PQ layout — probes prune to nprobe partition directories AND
    * scan 16-byte codes inside them; the original vectors are only touched
    * by the final rerank of k·refine candidates.
    */
  def encodeIvfLists(
      spark: org.apache.spark.sql.SparkSession, root: String,
      index: Similarity.IvfLake, model: PqModel, vecCol: String,
      codeCol: String = "pq_code"): graft.lake.LakeDataset = {
    val coded = encode(index.assigned.toDF, vecCol, model, codeCol)
    val target = s"$root/assigned_pq"
    // The saveIvf hazard — the coded plan reading the directory about to be
    // wiped — only exists when the source lists live AT the target (a
    // re-encode over a previously coded lake) or the source has no storage
    // at all (an arbitrary in-memory plan whose lineage we can't inspect).
    // The normal build reads `root/assigned` and writes `root/assigned_pq`:
    // disjoint trees, so the write job can stream the encode straight to
    // disk without first materializing the whole coded corpus as a
    // checkpoint — one corpus pass instead of two.
    val sourceDisjoint = index.assigned.storage.exists(_.root != target)
    val toWrite = if (sourceDisjoint) coded else coded.localCheckpoint(true)
    graft.lake.LakeDataset.deleteRecursively(
      java.nio.file.Paths.get(target))
    val ds = graft.lake.LakeDataset.forStorage(spark,
      partitionCols = Seq("centroid"), bucketCols = Nil, nBuckets = 0,
      bloomCols = Nil, storage = graft.model.StorageSpec(target))
    ds.insertWritten(toWrite)
    save(model, s"$root/assigned_pq") // codebooks travel with the lists
    ds
  }

  /** IVF-PQ search: prune to the `nprobe` closest lists (partition-directory
    * pruning — unprobed lists are never opened), ADC-scan their codes,
    * exact-rerank the top k·refine. With `nprobe` = all lists and enough
    * refine this reproduces the exact top-k (spec-pinned); at scale nprobe/
    * |lists| of the corpus is scanned, and of that only the code bytes.
    */
  def ivfPqTopK(
      lists: graft.lake.LakeDataset, centroids: Seq[(Int, Seq[Double])],
      model: PqModel, vecCol: String, idCol: String,
      query: Seq[Float], k: Int, nprobe: Int, refine: Int = 10,
      codeCol: String = "pq_code"): DataFrame = {
    val probes = Similarity.probeCentroids(centroids, query, nprobe)
    val scan = probes
      .map(p => lists.prunedDF(Map("centroid" -> p.toString)))
      .reduce(_ unionByName _)
    val qLit = array(query.map(q => lit(q.toDouble)): _*)
    scan
      .select(col(idCol), col(vecCol),
        PqAdcDot(col(codeCol), lutFor(model, query)).as("adc"))
      .orderBy(desc("adc"), col(idCol))
      .limit(k * refine)
      .select(col(idCol),
        round(Similarity.cosineHof(col(vecCol), qLit) * 1000000)
          .cast("long").as("cos_q"))
      .orderBy(desc("cos_q"), col(idCol))
      .limit(k)
  }

  // ------------------------------------------------------------- persistence

  private val om = new ObjectMapper()

  /** Persist codebooks as JSON (`_pq.json` under `root`) — the model is a
    * few hundred KB and reloads without retraining (training is sampled, so
    * a retrained model need not be identical; persisted codebooks make the
    * encode deterministic across sessions).
    */
  def save(model: PqModel, root: String): Unit = {
    val node = om.createObjectNode()
    val books = node.putArray("codebooks")
    model.codebooks.foreach { cb =>
      val bn = books.addArray()
      cb.foreach { cent =>
        val cn = bn.addArray()
        cent.foreach(cn.add)
      }
    }
    Files.createDirectories(Paths.get(root))
    Files.writeString(Paths.get(root, "_pq.json"), om.writeValueAsString(node))
  }

  def load(root: String): PqModel = {
    val node = om.readTree(Files.readString(Paths.get(root, "_pq.json")))
    import scala.jdk.CollectionConverters._
    val books = node.get("codebooks").elements().asScala.map { bn =>
      bn.elements().asScala.map { cn =>
        cn.elements().asScala.map(_.asDouble()).toArray
      }.toArray
    }.toArray
    require(books.nonEmpty && books.forall(_.nonEmpty), s"corrupt _pq.json under $root")
    require(books.flatten.map(_.length).distinct.length == 1,
      s"inconsistent sub-centroid widths in $root/_pq.json")
    PqModel(books)
  }
}
