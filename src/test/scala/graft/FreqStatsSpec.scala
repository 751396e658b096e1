package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{FreqAgg, FreqCodec, FreqSketch}
import graft.lake.{FreqMap, LakeDataset}

/** MG frequent-items stat family: exact regime (cardinality ≤ k) answers
  * exact order-independent counts from the catalog; approx regime certifies
  * `est ≤ true ≤ est + dec` and guaranteed presence above the bound;
  * appends merge, mutations invalidate + materialize re-tightens, manifests
  * round-trip, and unfreqable declared columns refuse at creation.
  */
class FreqStatsSpec extends SparkSpec {

  private def orders: DataFrame =
    spark.read.parquet(s"${sf()}/orders.parquet")

  private def freshLake(): (LakeDataset, DataFrame) = {
    val o = orders.withColumn("o_batch", (col("o_orderkey") / 500).cast("int"))
    val ds = LakeDataset.fromDataFrame(spark, o.filter(col("o_orderkey") < 600),
      partitionCols = Seq("o_batch"), freqCols = Seq("o_orderstatus"))
    ds.insert(o.filter(col("o_orderkey") >= 600))
    (ds, o)
  }

  test("exact regime: catalog top-k equals group-by counts, certified exact") {
    val (ds, o) = freshLake()
    val truth = o.groupBy("o_orderstatus").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val top = ds.metaTopK(Seq("o_orderstatus"), 10)
    assert(top.isDefined, "pure-append history must stay metadata-answerable")
    val got = top.get("o_orderstatus")
    assert(got.forall(_._4), "cardinality ≤ k must certify exact")
    assert(got.map(t => t._1 -> t._2).toMap == truth,
      s"exact-regime counts must equal the corpus: $got vs $truth")
    // ranked by count desc, ties by value — deterministic
    assert(got.map(_._2) == got.map(_._2).sorted(Ordering[Long].reverse))
  }

  test("approx regime: bounds certified, heavy items guaranteed present") {
    // 500 distinct tail values (cardinality >> k=64) + two planted heavies.
    val df = spark.range(20000).toDF("id")
      .withColumn("v", when(col("id") % 4 === 0, lit("heavy_a"))
        .when(col("id") % 4 === 1, lit("heavy_b"))
        .otherwise(concat(lit("tail_"), (col("id") % 500).cast("string"))))
      .repartition(16)
    val bytes = df.agg(FreqAgg.agg(col("v"))).head().getAs[Array[Byte]](0)
    val sk = FreqCodec.deserialize(bytes)
    assert(sk.n == 20000)
    assert(sk.dec > 0, "cardinality 502 > 64 must have evicted")
    val truth = df.groupBy("v").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // every stored counter is a certified lower bound within dec of truth
    sk.counters.foreach { case (v, est) =>
      val t = truth(v)
      assert(est <= t && t <= est + sk.dec, s"$v: est=$est true=$t dec=${sk.dec}")
    }
    // the MG guarantee: anything above the decrement bound is present
    Seq("heavy_a", "heavy_b").foreach { h =>
      assert(truth(h) > sk.dec && sk.counters.contains(h),
        s"$h (count ${truth(h)}) must survive dec=${sk.dec}")
    }
    // and they rank top-2 (their counts dwarf the tail + bound)
    assert(sk.topK(2).map(_._1).toSet == Set("heavy_a", "heavy_b"))
    // absent items are bounded too: no tail value above dec is missing
    truth.foreach { case (v, t) =>
      if (t > sk.dec) assert(sk.counters.contains(v), s"$v true=$t > dec missing")
    }
  }

  test("catalog fold is deterministic and survives a manifest round trip") {
    val (ds, _) = freshLake()
    val a1 = ds.metaTopK(Seq("o_orderstatus"), 3).get
    assert(ds.metaTopK(Seq("o_orderstatus"), 3).get == a1)
    val root = java.nio.file.Files.createTempDirectory("graft_freq").toString
    ds.storage = Some(graft.model.StorageSpec(root, "parquet", "snappy"))
    ds.toStorage()
    val loaded = LakeDataset.fromStorage(spark, root)
    assert(loaded.metaTopK(Seq("o_orderstatus"), 3).get == a1,
      "persisted sketches must reproduce the pre-save answers exactly")
  }

  test("upsert/delete invalidate; materialize re-tightens") {
    val (ds, o) = freshLake()
    assert(ds.metaTopK(Seq("o_orderstatus"), 3).isDefined)
    ds.delete(o.filter(col("o_orderkey") % 5 === 0).select("o_orderkey"),
      Seq("o_orderkey"))
    assert(ds.metaTopK(Seq("o_orderstatus"), 3).isEmpty,
      "a delete must fail the catalog answer open (counts can't subtract)")
    ds.materialize()
    val after = ds.metaTopK(Seq("o_orderstatus"), 10)
    assert(after.isDefined, "materialize must recompute sketches tight")
    val truth = ds.toDF.groupBy("o_orderstatus").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(after.get("o_orderstatus").map(t => t._1 -> t._2).toMap == truth,
      "re-tightened exact-regime counts must match the survivors")
  }

  test("SHOW STATS renders the top-values family from the catalog") {
    val (ds, o) = freshLake()
    val db = new graft.lake.Database(spark)
    db.register("freq_show", ds)
    val row = db.executeSql("SHOW STATS freq_show")
      .filter(col("column") === "o_orderstatus").head()
    val rendered = row.getAs[String]("top_values")
    assert(rendered != null, "tracked column must render top values")
    val truth = o.groupBy("o_orderstatus").count()
      .collect().map(r => s"${r.getString(0)}:${r.getLong(1)}").toSet
    // exact regime renders bare v:count pairs
    assert(rendered.split(", ").toSet.subsetOf(truth), rendered)
    // untracked columns stay NULL
    val other = db.executeSql("SHOW STATS freq_show")
      .filter(col("column") === "o_orderkey").head()
    assert(other.getAs[String]("top_values") == null)
  }

  test("grouped catalog top-k: per-partition-group exact counts") {
    val (ds, o) = freshLake()
    val grouped = ds.metaTopKGrouped(Seq("o_batch"), Seq("o_orderstatus"), 1)
    assert(grouped.isDefined)
    val got = grouped.get.map { case (vals, m) =>
      vals.head.asInstanceOf[Int] -> m("o_orderstatus").head
    }.toMap
    assert(got.nonEmpty && got.values.forall(_._4), "exact regime per group")
    // spot-check three groups against exact in-group counts
    got.toSeq.sortBy(_._1).take(3).foreach { case (b, (v, cnt, _, _)) =>
      val truth = o.filter(col("o_batch") === b).groupBy("o_orderstatus").count()
        .collect().map(r => r.getString(0) -> r.getLong(1))
        .sortBy { case (tv, tc) => (-tc, tv) }.head
      assert((v, cnt) == truth, s"group $b: got ($v,$cnt) want $truth")
    }
    // non-partition group column fails open
    assert(ds.metaTopKGrouped(Seq("o_orderstatus"), Seq("o_orderstatus"), 1).isEmpty)
  }

  test("untracked columns and empty tables fail open, never wrong") {
    val (ds, o) = freshLake()
    assert(ds.metaTopK(Seq("o_orderpriority"), 3).isEmpty,
      "untracked column has no sketches")
    // A zero-row table's top-k IS defined: no values. (Unlike quantiles,
    // which are undefined over zero values and fail open to None.)
    val empty = LakeDataset.fromDataFrame(spark, o.limit(0),
      freqCols = Seq("o_orderstatus"))
    assert(empty.metaTopK(Seq("o_orderstatus"), 3)
      .exists(_("o_orderstatus").isEmpty),
      "a zero-row table answers an empty ranking, exactly")
  }

  test("unfreqable declared column refuses at creation; absent stays legal") {
    val o = orders
    val e = intercept[IllegalArgumentException] {
      LakeDataset.fromDataFrame(spark, o, freqCols = Seq("o_totalprice"))
    }
    assert(e.getMessage.contains("frequent-items column"))
    LakeDataset.fromDataFrame(spark, o, freqCols = Seq("arrives_later"))
  }

  test("freq columns refuse column DDL (relayout instead)") {
    val (ds, _) = freshLake()
    val e = intercept[IllegalArgumentException] {
      ds.renameColumn("o_orderstatus", "status")
    }
    assert(e.getMessage.contains("frequent-items sketches"))
  }

  test("merge is order-independent in the exact regime; codec round-trips") {
    val parts = (0 until 7).map { i =>
      val s = new FreqSketch(64)
      (0 until 100).foreach(j => s.insert(s"v${(i + j) % 10}"))
      FreqCodec.serialize(s)
    }
    val a = FreqMap.fold(parts)
    val b = FreqMap.fold(parts.reverse)
    assert(a.isExact && b.isExact)
    assert(a.topK(10) == b.topK(10), "exact-regime folds must agree")
    assert(a.n == 700)
    // codec round trip is lossless and deterministic
    val bytes = FreqCodec.serialize(a)
    assert(java.util.Arrays.equals(bytes,
      FreqCodec.serialize(FreqCodec.deserialize(bytes))))
    // empty sketch is the merge identity
    val withEmpty = FreqMap.fold(parts :+ FreqMap.empty)
    assert(withEmpty.topK(10) == a.topK(10))
  }
}
