package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling and curation operators for training-data
  * pipelines.
  *
  * Everything here is hash- or window-based and fully deterministic: the
  * same corpus always yields the same sample, independent of partitioning,
  * executor count, or run order. That property — not randomness quality —
  * is what a 100 TB training pipeline needs: reruns reproduce the dataset
  * bit-for-bit, ablations share the holdout split, and a resumed job never
  * double-samples. (Spark's `df.sample` is seed-stable only for a FIXED
  * partitioning; these operators survive repartitioning.)
  *
  * Beyond-reference superset: the reference engine (TomScheffers/polars-lake)
  * has no sampling surface; these compose with its scan/SQL operators.
  */
object Sampling {

  /** Keep-decision hash: first 4 hex chars of md5 of the id rendered as a
    * string — 16 bits of uniform hash, string-comparable against a hex
    * threshold. md5-of-decimal-string is deliberately engine-portable (the
    * DuckDB oracle computes the identical digest), unlike xxhash64.
    */
  def hashKey(id: Column): Column = substring(md5(id.cast("string")), 1, 4)

  /** Deterministic ~rate sample: keep rows whose [[hashKey]] is <= the
    * given 4-hex-digit threshold ("1999" ≈ 10%, "7fff" ≈ 50%). A pure
    * narrow filter — no shuffle, no state, embarrassingly parallel, and
    * membership of a given id never changes as the corpus grows (the
    * property that keeps holdout sets stable across dataset versions).
    */
  def hashSample(df: DataFrame, idCol: String, hexThreshold: String): DataFrame = {
    require(hexThreshold.matches("[0-9a-f]{4}"), s"bad hex threshold: $hexThreshold")
    df.filter(hashKey(col(idCol)) <= lit(hexThreshold))
  }

  /** Stratified deterministic sample: a different keep-rate per stratum
    * value (e.g. keep 50% of English, 10% of everything else — the usual
    * language-rebalancing pass). Same narrow-filter shape as
    * [[hashSample]]; the per-stratum threshold resolves via one chained
    * CASE, so the plan stays a single codegen'd filter over the scan.
    */
  def stratifiedSample(
      df: DataFrame, idCol: String, strataCol: String,
      thresholds: Map[String, String], default: String): DataFrame = {
    (thresholds.values.toSeq :+ default).foreach(t =>
      require(t.matches("[0-9a-f]{4}"), s"bad hex threshold: $t"))
    val thr = thresholds.toSeq.sortBy(_._1).foldRight(lit(default): Column) {
      case ((v, t), acc) => when(col(strataCol) === v, lit(t)).otherwise(acc)
    }
    df.filter(hashKey(col(idCol)) <= thr)
  }

  /** Leak-proof train/val split: hash-split the corpus on each document's
    * near-dup CANONICAL id rather than its own id, so an entire near-dup
    * cluster always lands in ONE split. Splitting on raw ids leaks: a
    * template page and its 40 near-copies straddle train and val, and the
    * eval set silently scores memorization. `pairs` is any near-dup pair
    * table ([[Dedup.ngramJaccardPairs]], MinHash/SimHash buckets, an
    * incremental index's hits); its transitive closure
    * ([[Dedup.connectedComponents]]) defines the clusters.
    *
    * Scale shape: the component table is ∝ the DUPLICATE set, not the
    * corpus — the left join broadcasts at typical duplicate fractions and
    * falls open to a key-partitioned shuffle join above; the split itself
    * stays the same narrow md5 filter as [[hashSample]] (stable under
    * corpus growth, so the holdout survives dataset versioning). Columns
    * added: `canon` (the split key) and `split` ("val"/"train").
    */
  def leakproofSplit(
      corpus: DataFrame, pairs: DataFrame, idCol: String,
      valHexThreshold: String,
      aCol: String = "doc_a", bCol: String = "doc_b"): DataFrame = {
    require(valHexThreshold.matches("[0-9a-f]{4}"),
      s"bad hex threshold: $valHexThreshold")
    val comp = Dedup.connectedComponents(pairs, aCol, bCol)
      .select(col("doc_id").as(idCol), col("component"))
    corpus.join(comp, Seq(idCol), "left")
      .withColumn("canon", coalesce(col("component"), col(idCol).cast("long")))
      .drop("component")
      .withColumn("split",
        when(hashKey(col("canon")) <= lit(valHexThreshold), lit("val"))
          .otherwise(lit("train")))
  }

  /** Leak-proof K-FOLD assignment — [[leakproofSplit]] generalized from a
    * binary holdout to k cross-validation folds: every document's fold is
    * a Lehmer hash of its near-dup CANONICAL id mod k, so an entire
    * near-dup cluster shares ONE fold and no rotation of the folds ever
    * trains on a near-copy of its eval slice. Lehmer (the `negativePairs`
    * arithmetic, everything reduced mod 2^31−1 before multiplying) rather
    * than the md5 hex prefix because a mod-k needs integer arithmetic any
    * ANSI engine reproduces bit-for-bit. Loners fold by their own id, so
    * a document's fold never changes as the corpus grows. Same narrow
    * plan as the binary split: the component join is ∝ duplicates, the
    * fold expression is one codegen'd filterless projection.
    */
  def leakproofFolds(
      corpus: DataFrame, pairs: DataFrame, idCol: String, k: Int,
      aCol: String = "doc_a", bCol: String = "doc_b"): DataFrame = {
    require(k >= 2 && k <= 1024, s"fold count out of range: $k")
    val comp = Dedup.connectedComponents(pairs, aCol, bCol)
      .select(col("doc_id").as(idCol), col("component"))
    corpus.join(comp, Seq(idCol), "left")
      .withColumn("canon", coalesce(col("component"), col(idCol).cast("long")))
      .drop("component")
      .withColumn("fold",
        pmod(pmod(pmod(col("canon"), lit(2147483647L)) * lit(48271L),
          lit(2147483647L)), lit(k.toLong)).cast("int"))
  }

  /** Deterministic negative sampling for contrastive training: k
    * pseudo-random negatives per anchor, never the anchor itself, no
    * cartesian product anywhere. Rows are sharded by a Lehmer hash of the
    * id, ranked WITHIN their shard, and each (anchor, slot) draws a
    * shard-local offset from a second Lehmer stream — so the whole draw is
    * a per-shard window plus ONE equi-join on (shard, rank). Shard-local
    * draws are the scale design, not a shortcut: no global sort or dense
    * global index is ever built, shuffles are keyed by shard, and shard
    * count scales with the corpus (use ~|corpus|/1e6 shards at 100 TB so
    * each window sorts ~1M rows). Uniformity within a shard is exact:
    * offset ∈ [1, n-1] uniformly under the hash, self-pairing impossible
    * by construction. Fully deterministic — reruns, repartitions, and
    * resumed jobs reproduce the same pairs bit-for-bit.
    *
    * All arithmetic is reduced mod 2^31-1 BEFORE multiplying, so every
    * intermediate fits in an int64 — the same expressions run unchanged
    * (and bit-identically) in any ANSI SQL engine, which is what the
    * DuckDB oracle leans on.
    */
  def negativePairs(df: DataFrame, idCol: String, k: Int,
      shards: Int = 64): DataFrame = {
    require(k >= 1, "need k >= 1 negatives per anchor")
    require(shards >= 1, "need shards >= 1")
    val M = 2147483647L // 2^31 - 1
    val base = df.select(col(idCol).cast("long").as("anchor"))
      .withColumn("shard",
        pmod(pmod(pmod(col("anchor"), lit(M)) * 48271L, lit(M)), lit(shards))
          .cast("int"))
    val w = Window.partitionBy("shard").orderBy("anchor")
    val indexed = base
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("shard")))
      .filter(col("n") >= 2) // a 1-row shard has no possible negative
    val h = pmod(
      pmod(col("anchor"), lit(M)) * 40503L + col("slot") * 69621L, lit(M))
    val cand = indexed
      .withColumn("slot", explode(sequence(lit(1L), lit(k.toLong))))
      .withColumn("neg_rn",
        pmod(col("rn") + pmod(h, col("n") - 1), col("n")) + 1)
    cand.join(
        indexed.select(col("shard"), col("rn").as("neg_rn"),
          col("anchor").as("negative")),
        Seq("shard", "neg_rn"))
      .select("anchor", "slot", "negative")
  }

  /** Top-k rows per group under a deterministic order — the curation pass
    * that keeps the k best documents per language/source/domain. Expressed
    * as a rank-filter window so Spark's WindowGroupLimit optimization
    * (Spark 3.5+) pushes the k-bound INTO the shuffle: each map task ships
    * only its local top-k per group, never the full group — the difference
    * between shuffling k rows and shuffling 100 TB.
    */
  def topKPerGroup(
      df: DataFrame, groupCols: Seq[String], order: Seq[Column], k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(order: _*)
    df.withColumn("__graft_rank", row_number().over(w))
      .filter(col("__graft_rank") <= k)
      .drop("__graft_rank")
  }

  /** Budget-constrained greedy selection: keep the best-scoring rows whose
    * cumulative cost fits `budget` — the "fill a token budget with the
    * highest-quality documents" step of corpus curation. Equivalent to
    * `SUM(cost) OVER (ORDER BY score DESC, tie) <= budget`, but a global
    * window would funnel the corpus through ONE task; this runs the
    * prefix sum distributed:
    *
    *  1. range-repartition + sort by (score desc, tie) — partition i holds
    *     strictly better rows than partition i+1;
    *  2. one tiny aggregation of per-partition cost totals → driver-side
    *     prefix offsets (O(partitions) values);
    *  3. each partition computes its LOCAL running sum imperatively and
    *     adds its offset — the canonical mapPartitions case: a running
    *     prefix is inherently sequential within a partition and
    *     embarrassingly parallel across them.
    *
    * Early partitions whose offset already exceeds the budget could be
    * skipped entirely; rows stream out until the budget line, so the
    * output task work is ∝ selected rows. Deterministic: `tie` must make
    * (score, tie) unique (an id column).
    *
    * `costCol` must be integral (exact accumulation — a float prefix sum
    * would make the cut row partitioning-dependent), non-NULL, and >= 0:
    * a NULL cost has no defined prefix-sum semantics and a negative one
    * breaks the takeWhile ≡ window-filter equivalence (a later row's
    * cumulative sum could drop back under budget). Both are enforced by
    * piggybacking min/null counts on the per-partition totals aggregate —
    * no extra pass.
    */
  def budgetSelect(
      df: DataFrame, score: Column, tie: Column, costCol: String,
      budget: Long, nPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    require(Set[org.apache.spark.sql.types.DataType](
        org.apache.spark.sql.types.ByteType, org.apache.spark.sql.types.ShortType,
        org.apache.spark.sql.types.IntegerType, org.apache.spark.sql.types.LongType)
        .contains(df.schema(costCol).dataType),
      s"$costCol must be integral for an exact prefix sum")
    val np = if (nPartitions > 0) nPartitions
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    // Pin the physical layout: repartitionByRange SAMPLES to choose
    // bounds, so the offsets job and the selection job must see ONE
    // materialized layout, not two resamplings.
    val ranked = df
      .repartitionByRange(np, score.desc, tie.asc)
      .sortWithinPartitions(score.desc, tie.asc)
      .localCheckpoint(true)
    // Per-partition cost totals: a #partitions-sized aggregate, collected.
    // The same job validates the cost precondition (no NULLs, no negatives)
    // so a bad corpus fails loudly instead of NPE-ing mid-prefix-sum or
    // silently diverging from the window-sum equivalence.
    val sumRows = ranked
      .groupBy(spark_partition_id().as("__pid"))
      .agg(sum(col(costCol).cast("long")).as("__cost"),
        min(col(costCol).cast("long")).as("__min"),
        count(lit(1)).as("__rows"), count(col(costCol)).as("__nonnull"))
      .collect()
    sumRows.foreach { r =>
      require(r.getLong(4) == r.getLong(3),
        s"budgetSelect: $costCol contains NULL values — costs must be non-NULL")
      require(r.getLong(2) >= 0L,
        s"budgetSelect: $costCol contains negative values — costs must be >= 0")
    }
    val sums = sumRows.map(r => r.getInt(0) -> r.getLong(1)).toMap
    val nParts = ranked.rdd.getNumPartitions
    val offsets: Array[Long] = {
      val a = new Array[Long](nParts + 1)
      for (i <- 0 until nParts) a(i + 1) = a(i) + sums.getOrElse(i, 0L)
      a
    }
    val costIdx = ranked.schema.fieldIndex(costCol)
    val schema = ranked.schema
    val selected = ranked.rdd.mapPartitionsWithIndex { (pid, it) =>
      var cum = offsets(pid)
      if (cum > budget) Iterator.empty
      else it.takeWhile { row =>
        cum += row.getAs[Number](costIdx).longValue()
        cum <= budget
      }
    }
    spark.createDataFrame(selected, schema)
  }

  /** Per-stratum mixture weights for a target blend: given a weight column
    * (token counts, usually) and a target share per stratum (uniform when
    * omitted), emit each stratum's actual share and the sampling weight
    * `target_share / actual_share` that a downstream weighted sampler
    * applies to hit the target blend. One tiny aggregation (#strata rows)
    * plus an unpartitioned window over it — the window is over the
    * AGGREGATE, never the corpus, so the single-partition stage holds a
    * handful of rows at any scale.
    */
  def mixtureWeights(
      df: DataFrame, strataCol: String, weight: Column,
      targetShares: Map[String, Double] = Map.empty): DataFrame = {
    val agg = df.groupBy(col(strataCol))
      .agg(sum(weight).as("stratum_weight"))
    val total = Window.partitionBy()
    val target =
      if (targetShares.isEmpty)
        lit(1.0) / count(lit(1)).over(total).cast("double")
      else targetShares.toSeq.sortBy(_._1).foldRight(lit(0.0): Column) {
        case ((v, s), acc) => when(col(strataCol) === v, lit(s)).otherwise(acc)
      }
    agg
      .withColumn("share",
        col("stratum_weight").cast("double") / sum("stratum_weight").over(total))
      .withColumn("target_share", target)
      .withColumn("sample_weight", col("target_share") / col("share"))
  }
}
