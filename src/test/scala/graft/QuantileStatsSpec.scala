package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{GkAgg, GkCodec}
import graft.lake.{LakeDataset, QuantileMap}

/** GK quantile-summary stat family: the catalog fold answers within the
  * rank-error bound (never bit-equality — see QuantileMap for why no
  * mergeable quantile summary can promise that), appends fold, mutations
  * invalidate + materialize re-tightens, manifests round-trip, and
  * unquantileable declared columns refuse at creation.
  */
class QuantileStatsSpec extends SparkSpec {

  private def orders: DataFrame =
    spark.read.parquet(s"${sf()}/orders.parquet")

  /** Exact rank (CDF value) of `v` in `df.col` — the error metric GK
    * bounds: a q-quantile answer is correct iff its rank is within ε of q.
    */
  private def rankOf(df: DataFrame, c: String, v: Double): Double = {
    val r = df.agg(
      sum(when(col(c) <= lit(v), 1L).otherwise(0L)).cast("double"),
      count(lit(1)).cast("double")).head()
    r.getDouble(0) / r.getDouble(1)
  }

  // 2ε is the GK merge bound; +2/n absorbs rank discreteness at small n.
  private def bound(n: Long): Double = 2 * QuantileMap.Eps + 2.0 / n

  private def freshLake(): (LakeDataset, DataFrame) = {
    val o = orders.withColumn("o_batch", (col("o_orderkey") / 500).cast("int"))
    val ds = LakeDataset.fromDataFrame(spark, o.filter(col("o_orderkey") < 600),
      partitionCols = Seq("o_batch"), quantileCols = Seq("o_totalprice"))
    ds.insert(o.filter(col("o_orderkey") >= 600))
    (ds, o)
  }

  test("catalog fold answers every quantile within the rank bound") {
    val (ds, o) = freshLake()
    val n = o.count()
    val qs = Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)
    val meta = ds.metaApproxQuantile(Seq("o_totalprice"), qs)
    assert(meta.isDefined, "pure-append history must stay metadata-answerable")
    qs.zip(meta.get("o_totalprice")).foreach { case (q, v) =>
      val r = rankOf(o, "o_totalprice", v)
      assert(math.abs(r - q) <= bound(n),
        s"q=$q answered $v at rank $r (off by ${math.abs(r - q)})")
    }
  }

  test("catalog fold is deterministic and survives a manifest round trip") {
    val (ds, _) = freshLake()
    val a1 = ds.metaApproxQuantile(Seq("o_totalprice"), Seq(0.5, 0.9)).get
    val a2 = ds.metaApproxQuantile(Seq("o_totalprice"), Seq(0.5, 0.9)).get
    assert(a1 == a2, "same catalog state must answer identically")
    val root = java.nio.file.Files.createTempDirectory("graft_quant").toString
    ds.storage = Some(graft.model.StorageSpec(root, "parquet", "snappy"))
    ds.toStorage()
    val loaded = LakeDataset.fromStorage(spark, root)
    assert(loaded.metaApproxQuantile(Seq("o_totalprice"), Seq(0.5, 0.9)).get == a1,
      "persisted summaries must reproduce the pre-save answers exactly")
  }

  test("upsert/delete invalidate; materialize re-tightens") {
    val (ds, o) = freshLake()
    assert(ds.metaApproxQuantile(Seq("o_totalprice"), Seq(0.5)).isDefined)
    ds.delete(o.filter(col("o_orderkey") % 5 === 0).select("o_orderkey"),
      Seq("o_orderkey"))
    assert(ds.metaApproxQuantile(Seq("o_totalprice"), Seq(0.5)).isEmpty,
      "a delete must fail the catalog answer open (summaries can't subtract)")
    ds.materialize()
    val meta = ds.metaApproxQuantile(Seq("o_totalprice"), Seq(0.5))
    assert(meta.isDefined, "materialize must recompute summaries tight")
    val survivors = ds.toDF
    val r = rankOf(survivors, "o_totalprice", meta.get("o_totalprice").head)
    assert(math.abs(r - 0.5) <= bound(survivors.count()))
  }

  test("grouped catalog quantiles: per-partition-group answers within bound") {
    val (ds, o) = freshLake()
    val grouped = ds.metaApproxQuantileGrouped(
      Seq("o_batch"), Seq("o_totalprice"), Seq(0.5))
    assert(grouped.isDefined)
    val byBatch = grouped.get.map { case (vals, m) =>
      vals.head.asInstanceOf[Int] -> m("o_totalprice").head
    }.toMap
    assert(byBatch.nonEmpty)
    // spot-check three groups against their exact in-group CDF
    byBatch.toSeq.sortBy(_._1).take(3).foreach { case (b, v) =>
      val g = o.filter(col("o_batch") === b)
      val r = rankOf(g, "o_totalprice", v)
      assert(math.abs(r - 0.5) <= bound(g.count()),
        s"group o_batch=$b median $v at rank $r")
    }
    // non-partition group column fails open
    assert(ds.metaApproxQuantileGrouped(
      Seq("o_orderstatus"), Seq("o_totalprice"), Seq(0.5)).isEmpty)
  }

  test("untracked / unknown columns and empty tables fail open, never wrong") {
    val (ds, o) = freshLake()
    assert(ds.metaApproxQuantile(Seq("o_custkey"), Seq(0.5)).isEmpty,
      "untracked column has no summaries")
    val empty = LakeDataset.fromDataFrame(spark, o.limit(0),
      quantileCols = Seq("o_totalprice"))
    assert(empty.metaApproxQuantile(Seq("o_totalprice"), Seq(0.5)).isEmpty,
      "no quantile is defined over zero rows")
  }

  test("unquantileable declared column refuses at creation; absent stays legal") {
    val o = orders
    val e = intercept[IllegalArgumentException] {
      LakeDataset.fromDataFrame(spark, o, quantileCols = Seq("o_orderstatus"))
    }
    assert(e.getMessage.contains("quantile column"))
    // declared-but-absent arrives by schema evolution later — legal now
    LakeDataset.fromDataFrame(spark, o, quantileCols = Seq("arrives_later"))
  }

  test("quantile columns refuse column DDL (relayout instead)") {
    val (ds, _) = freshLake()
    val e = intercept[IllegalArgumentException] {
      ds.renameColumn("o_totalprice", "price")
    }
    assert(e.getMessage.contains("quantile summaries"))
  }

  test("GkAgg: multi-partition agg answers within bound; nulls skipped; empty = identity") {
    val n = 100000L
    // uniform 0..n-1 over 32 shuffled partitions — the true q-quantile is ~q*n
    val df = spark.range(n).toDF("id")
      .withColumn("v", (col("id") * 2654435761L % n).cast("double"))
      .repartition(32)
    val bytes = df.agg(GkAgg.agg(col("v"))).head().getAs[Array[Byte]](0)
    val qs = GkCodec.deserialize(bytes)
    assert(qs.count == n)
    Seq(0.1, 0.5, 0.9).foreach { q =>
      val v = qs.query(q).get
      assert(math.abs(v / n - q) <= 2 * QuantileMap.Eps + 2.0 / n,
        s"q=$q answered $v over uniform 0..$n")
    }
    // nulls skipped: count excludes them
    val withNulls = spark.range(100).toDF("id")
      .select(when(col("id") % 2 === 0, col("id").cast("double")).as("v"))
    val b2 = withNulls.agg(GkAgg.agg(col("v"))).head().getAs[Array[Byte]](0)
    assert(GkCodec.deserialize(b2).count == 50)
    // empty input evaluates to the empty summary, not SQL NULL
    val b3 = spark.range(0).toDF("id").select(col("id").cast("double").as("v"))
      .agg(GkAgg.agg(col("v"))).head().getAs[Array[Byte]](0)
    assert(b3 != null && GkCodec.deserialize(b3).count == 0L)
    assert(GkCodec.deserialize(b3).query(0.5).isEmpty)
  }

  test("SHOW STATS: approx families within bounds, exact families exact, untight NULLs") {
    val o = orders.withColumn("o_batch", (col("o_orderkey") / 500).cast("int"))
    val ds = graft.lake.LakeDataset.fromDataFrame(spark, o,
      partitionCols = Seq("o_batch"),
      sketchCols = Seq("o_custkey"), quantileCols = Seq("o_totalprice"))
    val db = new graft.lake.Database(spark)
    db.register("qss_t", ds)
    val stats = db.executeSql("SHOW STATS FOR qss_t")
      .collect().map(r => r.getString(0) -> r).toMap
    val n = o.count()
    val price = stats("o_totalprice")
    assert(price.getLong(1) == n)
    assert(price.isNullAt(2) && price.isNullAt(5),
      "double columns never metadata-answer sums, by contract")
    val p50 = price.getDouble(7); val p95 = price.getDouble(8)
    assert(math.abs(rankOf(o, "o_totalprice", p50) - 0.5) <= bound(n))
    assert(math.abs(rankOf(o, "o_totalprice", p95) - 0.95) <= bound(n))
    val cust = stats("o_custkey")
    assert(cust.getLong(2) == o.filter(col("o_custkey").isNotNull).count())
    val scanDistinct = o.agg(
      hll_sketch_estimate(hll_sketch_agg(col("o_custkey"),
        lit(graft.lake.HllMap.LgK)))).head().getLong(0)
    assert(cust.getLong(6) == scanDistinct, "HLL fold == scan, bit for bit")
    assert(cust.isNullAt(7), "untracked quantile column stays NULL")
    // a mutation untightens: approx columns go NULL, nothing stale served
    ds.delete(o.filter(col("o_orderkey") % 7 === 0).select("o_orderkey"),
      Seq("o_orderkey"))
    val after = db.executeSql("SHOW STATS qss_t")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(after("o_totalprice").isNullAt(7) && after("o_custkey").isNullAt(6),
      "untight parts must NULL the approx answers, never serve stale ones")
  }

  test("QuantileMap.merge directional soundness (current-only keeps, delta-only drops)") {
    val a = spark.range(1000).select(col("id").cast("double").as("v"))
      .agg(GkAgg.agg(col("v"))).head().getAs[Array[Byte]](0)
    val b = spark.range(1000, 2000).select(col("id").cast("double").as("v"))
      .agg(GkAgg.agg(col("v"))).head().getAs[Array[Byte]](0)
    val merged = QuantileMap.merge(
      Map("x" -> a, "keep" -> a), Map("x" -> b, "dropOnlyInDelta" -> b))
    assert(merged.keySet == Set("x", "keep"))
    val folded = GkCodec.deserialize(merged("x"))
    assert(folded.count == 2000)
    // median of 0..1999 is ~1000 — the merged summary covers both streams
    assert(math.abs(folded.query(0.5).get - 1000.0) <= 2000 * (2 * QuantileMap.Eps) + 2)
  }
}
