package graft

import org.apache.spark.sql.functions._

import graft.lake.LakeDataset

/** Semantic fidelity of upsert (reference src/dataset.rs:108-147):
  * right-wins coalesce, NULL-in-incoming preserves old, unmatched keys from
  * both sides survive, idempotence.
  */
class UpsertSpec extends SparkSpec {
  import spark.implicits._

  private def freshDs() = LakeDataset.fromDataFrame(spark,
    Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)).toDF("k", "name", "v"))

  test("upsert updates matched keys, inserts new keys") {
    val ds = freshDs()
    ds.upsert(Seq((2L, "B2", 200.0), (9L, "i", 90.0)).toDF("k", "name", "v"), Seq("k"))
    val got = ds.toDF.orderBy("k").as[(Long, String, Double)].collect().toSeq
    assert(got == Seq((1L, "a", 10.0), (2L, "B2", 200.0), (3L, "c", 30.0), (9L, "i", 90.0)))
  }

  test("NULL in incoming column preserves the old value") {
    val ds = freshDs()
    val delta = Seq((2L, Option.empty[String], Some(999.0))).toDF("k", "name", "v")
    ds.upsert(delta, Seq("k"))
    val row = ds.toDF.filter(col("k") === 2).head()
    assert(row.getString(1) == "b", "null name must not overwrite")
    assert(row.getDouble(2) == 999.0)
  }

  test("duplicate source keys error loudly; conf opts a trusted feed out") {
    val dup = Seq((2L, "first", 1.0), (2L, "second", 2.0)).toDF("k", "name", "v")
    val ds = freshDs()
    val e = intercept[IllegalArgumentException](ds.upsert(dup, Seq("k")))
    assert(e.getMessage.contains("k=2") &&
      e.getMessage.contains("checkSourceKeys"), e.getMessage)
    // nothing mutated: the probe fires BEFORE the merge
    assert(ds.toDF.count() == 3)
    // trusted-deduped feeds opt out per session — the probe is skipped and
    // the merge runs; with ACTUAL duplicates the outcome is unspecified
    // (the join fans out), which is exactly why the default probes.
    spark.conf.set("spark.graft.merge.checkSourceKeys", "false")
    try {
      ds.upsert(dup, Seq("k"))
      assert(ds.toDF.filter(col("k") === 2).count() >= 1)
    } finally spark.conf.set("spark.graft.merge.checkSourceKeys", "true")
  }

  test("multiple NULL-key rows pass the probe (null-unsafe join never fans out)") {
    // groupBy would lump NULL keys into one group; the probe must not,
    // because the merge join's equality is null-unsafe — NULL-key rows
    // match nothing and insert as distinct rows, no cardinality ambiguity.
    val ds = freshDs()
    val before = ds.toDF.count()
    val nulls = Seq((Option.empty[Long], "n1", 1.0), (Option.empty[Long], "n2", 2.0))
      .toDF("k", "name", "v")
    ds.upsert(nulls, Seq("k")) // must NOT throw
    assert(ds.toDF.filter(col("k").isNull).count() == 2)
    assert(ds.toDF.count() == before + 2)
    // a REAL duplicate alongside NULLs still trips the probe
    val mixed = Seq((Some(2L), "a", 1.0), (Some(2L), "b", 2.0),
      (Option.empty[Long], "n", 3.0)).toDF("k", "name", "v")
    intercept[IllegalArgumentException](ds.upsert(mixed, Seq("k")))
  }

  test("upsert is idempotent: same batch twice == once") {
    val delta = Seq((2L, "B2", 200.0), (9L, "i", 90.0)).toDF("k", "name", "v")
    val once = freshDs()
    once.upsert(delta, Seq("k"))
    val twice = freshDs()
    twice.upsert(delta, Seq("k"))
    twice.upsert(delta, Seq("k"))
    assert(once.toDF.orderBy("k").collect().toSeq ==
      twice.toDF.orderBy("k").collect().toSeq)
  }

  test("schema evolution: incoming extra column appended, missing column kept") {
    val ds = freshDs()
    val delta = Seq((2L, 5)).toDF("k", "extra")
    ds.upsert(delta, Seq("k"))
    val got = ds.toDF.orderBy("k").collect()
    assert(got.map(_.schema.fieldNames.toSeq).head == Seq("k", "name", "v", "extra"))
    assert(got(1).getString(1) == "b", "missing incoming column keeps old value")
    assert(got(1).getInt(3) == 5)
    assert(got(0).isNullAt(3), "pre-existing rows get null for new column")
  }

  test("delete removes matching keys (left anti)") {
    val ds = freshDs()
    ds.delete(Seq(Tuple1(2L)).toDF("k"), Seq("k"))
    assert(ds.toDF.select("k").as[Long].collect().sorted.toSeq == Seq(1L, 3L))
  }

  test("insert appends and allows missing columns") {
    val ds = freshDs()
    ds.insert(Seq((7L, "g")).toDF("k", "name"))
    val got = ds.toDF.filter(col("k") === 7).head()
    assert(got.getString(1) == "g" && got.isNullAt(2))
    assert(ds.toDF.count() == 4)
  }

  test("deep upsert chains auto-compact (plan-depth guard)") {
    val ds = freshDs()
    (1 to 30).foreach { i =>
      ds.upsert(Seq((2L, s"n$i", i.toDouble)).toDF("k", "name", "v"), Seq("k"))
    }
    // After AutoCompactDepth mutations the part must have checkpointed:
    val part = ds.part(ds.partKeys.head).get
    assert(part.mutationOps.get < graft.lake.LakePart.AutoCompactDepth)
    val row = ds.toDF.filter(col("k") === 2).head()
    assert(row.getString(1) == "n30" && row.getDouble(2) == 30.0)
  }

  test("audit columns: created_at preserved, changed_at renewed on touched rows") {
    val t0 = lit("2030-01-01 00:00:00").cast("timestamp")
    val t1 = lit("2030-01-02 00:00:00").cast("timestamp")
    val clock = new java.util.concurrent.atomic.AtomicReference(t0)
    val ds = LakeDataset.fromDataFrame(spark,
      Seq((1L, "a"), (2L, "b")).toDF("k", "s"),
      auditColumns = true, auditClock = () => clock.get())
    clock.set(t1)
    ds.upsert(Seq((2L, "B"), (3L, "c")).toDF("k", "s"), Seq("k"))
    val rows = ds.toDF.orderBy("k")
      .select(col("k"), col("s"), col("created_at").cast("string"), col("changed_at").cast("string"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
    assert(rows(0) == ((1L, "a", "2030-01-01 00:00:00", "2030-01-01 00:00:00")), "untouched")
    assert(rows(1) == ((2L, "B", "2030-01-01 00:00:00", "2030-01-02 00:00:00")), "updated")
    assert(rows(2) == ((3L, "c", "2030-01-02 00:00:00", "2030-01-02 00:00:00")), "inserted")
  }

  test("keepFirst drops key-duplicates deterministically") {
    val df = Seq((1L, "z", 3), (1L, "a", 2), (2L, "m", 1)).toDF("k", "s", "v")
    val got = graft.operators.Dedup.keepFirst(df, Seq("k"), Seq(col("s")))
      .orderBy("k").as[(Long, String, Int)].collect().toSeq
    assert(got == Seq((1L, "a", 2), (2L, "m", 1)))
  }

  test("upsert routed per partition+bucket cell stays correct") {
    val base = spark.read.parquet(s"${sf()}/orders.parquet")
    val ds = LakeDataset.fromDataFrame(spark, base,
      partitionCols = Seq("o_orderstatus"), bucketCols = Seq("o_custkey"), nBuckets = 5)
    val delta = base.filter(col("o_orderkey") % 3 === 0)
      .withColumn("o_totalprice", col("o_totalprice") * 2)
    ds.upsert(delta, Seq("o_orderkey"))
    val expect = base.withColumn("o_totalprice",
      when(col("o_orderkey") % 3 === 0, col("o_totalprice") * 2)
        .otherwise(col("o_totalprice")))
    assert(ds.toDF.count() == base.count())
    val gotSum = ds.toDF.agg(sum(col("o_totalprice").cast("decimal(38,2)"))).head().getDecimal(0)
    val expSum = expect.agg(sum(col("o_totalprice").cast("decimal(38,2)"))).head().getDecimal(0)
    assert(gotSum == expSum)
  }
}
