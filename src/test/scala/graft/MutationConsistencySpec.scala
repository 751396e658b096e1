package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.lake.LakeDataset
import graft.model.StorageSpec

/** Consistency of the mutation paths across routing regimes — the narrow
  * (per-cell) and wide (global-join) upsert paths must agree even when a
  * delta moves an existing key to a different partition/bucket cell, deletes
  * must find rows whose cell the key rows don't name, NULL bucket values get
  * a dedicated cell, and concurrent mutations must not lose updates.
  */
class MutationConsistencySpec extends SparkSpec {
  import spark.implicits._

  test("narrow upsert that changes a partition value migrates the row (no duplicate)") {
    // partition col `p` NOT in keys -> cell can migrate
    val base = Seq((1L, "A", 10.0), (2L, "A", 20.0), (3L, "B", 30.0),
      (4L, "B", 40.0), (5L, "C", 50.0), (6L, "C", 60.0)).toDF("k", "p", "v")
    val ds = LakeDataset.fromDataFrame(spark, base, partitionCols = Seq("p"))
    assert(ds.numParts == 3)
    // narrow delta: touches ONE cell's worth of rows, but key 2 moves A -> C
    ds.upsert(Seq((2L, "C", 99.0)).toDF("k", "p", "v"), Seq("k"))
    val got = ds.toDF.orderBy("k").as[(Long, String, Double)].collect().toSeq
    assert(got == Seq((1L, "A", 10.0), (2L, "C", 99.0), (3L, "B", 30.0),
      (4L, "B", 40.0), (5L, "C", 50.0), (6L, "C", 60.0)))
    assert(ds.toDF.filter(col("k") === 2).count() == 1, "migrated key must not duplicate")
  }

  test("narrow and wide upsert paths agree on a migrating delta") {
    def build() = LakeDataset.fromDataFrame(spark,
      Seq((1L, "A", 1.0), (2L, "A", 2.0), (3L, "B", 3.0), (4L, "B", 4.0),
        (5L, "C", 5.0), (6L, "D", 6.0)).toDF("k", "p", "v"),
      partitionCols = Seq("p"))
    // narrow-shaped delta (1 of 4 cells) and wide-shaped delta (3 of 4 cells),
    // both moving key 1 from A to D
    val narrow = build()
    narrow.upsert(Seq((1L, "D", 11.0)).toDF("k", "p", "v"), Seq("k"))
    val wide = build()
    wide.upsert(Seq((1L, "D", 11.0), (3L, "B", 33.0), (5L, "C", 55.0))
      .toDF("k", "p", "v"), Seq("k"))
    assert(narrow.toDF.filter(col("k") === 1).count() == 1)
    assert(wide.toDF.filter(col("k") === 1).count() == 1)
    val n1 = narrow.toDF.filter(col("k") === 1).head()
    val w1 = wide.toDF.filter(col("k") === 1).head()
    assert(n1.getString(1) == "D" && w1.getString(1) == "D")
    assert(narrow.toDF.count() == 6 && wide.toDF.count() == 6)
  }

  test("stable cell values keep the narrow path cheap (no global rebuild)") {
    val base = Seq((1L, "A", 1.0), (2L, "A", 2.0), (3L, "B", 3.0), (4L, "B", 4.0),
      (5L, "C", 5.0), (6L, "D", 6.0)).toDF("k", "p", "v")
    val ds = LakeDataset.fromDataFrame(spark, base, partitionCols = Seq("p"))
    val before = ds.partKeys.toSet
    // delta keeps key 3's partition value -> no migration -> per-cell path;
    // the untouched cells' parts must be the SAME objects afterwards.
    val untouched = ds.partKeys.filterNot(_.partValues.exists(_._2 == "B"))
      .map(k => k -> ds.part(k).get).toMap
    ds.upsert(Seq((3L, "B", 33.0)).toDF("k", "p", "v"), Seq("k"))
    assert(ds.partKeys.toSet == before)
    untouched.foreach { case (k, p) =>
      assert(ds.part(k).get eq p, s"untouched cell $k must not be replanned")
    }
    assert(ds.toDF.filter(col("k") === 3).head().getDouble(2) == 33.0)
  }

  test("delete finds rows when keys don't name the partition (located cells)") {
    val base = Seq((1L, "A", 1.0), (2L, "A", 2.0), (3L, "B", 3.0), (4L, "B", 4.0))
      .toDF("k", "p", "v")
    val ds = LakeDataset.fromDataFrame(spark, base, partitionCols = Seq("p"))
    val untouchedB = ds.partKeys.find(_.partValues.exists(_._2 == "B"))
      .map(k => ds.part(k).get).get
    ds.delete(Seq(Tuple1(1L)).toDF("k"), Seq("k"))
    assert(ds.toDF.select("k").as[Long].collect().sorted.toSeq == Seq(2L, 3L, 4L))
    // cell B holds no deleted keys -> must not be replanned
    val stillB = ds.partKeys.find(_.partValues.exists(_._2 == "B"))
      .map(k => ds.part(k).get).get
    assert(stillB eq untouchedB)
  }

  test("NULL bucket values get a dedicated cell and survive round-trips") {
    val base = Seq((Some(1L), "a"), (Some(2L), "b"), (None, "c"), (None, "d"))
      .toDF("k", "s")
    val ds = LakeDataset.fromDataFrame(spark, base, bucketCols = Seq("k"), nBuckets = 5)
    assert(ds.toDF.count() == 4)
    assert(ds.partKeys.exists(_.bucketNr.contains(LakeDataset.NullBucket)))
    ds.insert(Seq((Option.empty[Long], "e")).toDF("k", "s"))
    assert(ds.toDF.count() == 5)
    assert(ds.toDF.filter(col("k").isNull).count() == 3)

    val root = Files.createTempDirectory("graft_nullb").toString
    val ds2 = LakeDataset.fromDataFrame(spark, base, bucketCols = Seq("k"),
      nBuckets = 5, storage = Some(StorageSpec(root)))
    ds2.toStorage()
    val back = LakeDataset.fromStorage(spark, root)
    assert(back.toDF.count() == 4)
    assert(back.toDF.filter(col("k").isNull).count() == 2)
    LakeDataset.deleteRecursively(java.nio.file.Paths.get(root))
  }

  test("bucketPrunedDF / prunedDF with zero matching cells return empty frames") {
    val base = Seq((1L, "A", 1.0), (6L, "B", 2.0)).toDF("k", "p", "v")
    val ds = LakeDataset.fromDataFrame(spark, base,
      partitionCols = Seq("p"), bucketCols = Seq("k"), nBuckets = 5)
    // bucket id 3 has no cell (keys 1 and 6 hash to 1); must not throw
    val empty = ds.bucketPrunedDF(3L)
    assert(empty.count() == 0)
    assert(empty.schema.fieldNames.toSeq == Seq("k", "p", "v"))
    val emptyP = ds.prunedDF(Map("p" -> "Z"))
    assert(emptyP.count() == 0)
  }

  test("rowsCount recounts unknown (-1) counters instead of poisoning the sum") {
    val root = Files.createTempDirectory("graft_rows").toString
    val base = Seq((1L, "A"), (2L, "A"), (3L, "B")).toDF("k", "p")
    val ds = LakeDataset.fromDataFrame(spark, base,
      partitionCols = Seq("p"), storage = Some(StorageSpec(root)))
    ds.toStorage()
    val back = LakeDataset.fromStorage(spark, root) // parts load with rows = -1
    assert(back.rowsCount == 3, "lazy-loaded parts must recount, not sum -1 sentinels")
    ds.delete(Seq(Tuple1(1L)).toDF("k"), Seq("k")) // delete sets rows = -1
    assert(ds.rowsCount == 2)
    LakeDataset.deleteRecursively(java.nio.file.Paths.get(root))
  }

  test("delete chains auto-compact (plan-depth guard)") {
    val ds = LakeDataset.fromDataFrame(spark,
      (1L to 100L).map(i => (i, s"s$i")).toDF("k", "s"))
    (1 to 30).foreach { i => ds.delete(Seq(Tuple1(i.toLong)).toDF("k"), Seq("k")) }
    val part = ds.part(ds.partKeys.head).get
    assert(part.mutationOps.get < graft.lake.LakePart.AutoCompactDepth,
      "delete chain must trigger the same depth guard as insert/upsert")
    assert(ds.toDF.count() == 70)
  }

  test("empty batches are no-ops for insert, upsert, and delete") {
    val base = Seq((1L, "A", 1.0), (2L, "B", 2.0)).toDF("k", "p", "v")
    val ds = LakeDataset.fromDataFrame(spark, base, partitionCols = Seq("p"))
    val empty = base.limit(0)
    ds.insert(empty)
    ds.upsert(empty, Seq("k"))
    ds.delete(empty.select("k"), Seq("k"))
    assert(ds.toDF.count() == 2)
    assert(ds.numParts == 2)
  }

  test("NULL partition values survive mutation and storage round-trips") {
    val root = Files.createTempDirectory("graft_nullp").toString
    val base = Seq((1L, Some("A"), 1.0), (2L, None, 2.0), (3L, None, 3.0))
      .toDF("k", "p", "v")
    val ds = LakeDataset.fromDataFrame(spark, base,
      partitionCols = Seq("p"), storage = Some(StorageSpec(root)))
    assert(ds.numParts == 2)
    ds.upsert(Seq((2L, Option.empty[String], 22.0)).toDF("k", "p", "v"), Seq("k"))
    assert(ds.toDF.filter(col("k") === 2).head().getDouble(2) == 22.0)
    ds.toStorage()
    val back = LakeDataset.fromStorage(spark, root)
    assert(back.toDF.count() == 3)
    assert(back.toDF.filter(col("p").isNull).count() == 2)
    LakeDataset.deleteRecursively(java.nio.file.Paths.get(root))
  }

  test("concurrent upserts on disjoint keys lose no updates") {
    val base = (1L to 80L).map(i => (i, 0.0)).toDF("k", "v")
    val ds = LakeDataset.fromDataFrame(spark, base, bucketCols = Seq("k"), nBuckets = 4)
    val threads = (0 until 8).map { t =>
      new Thread(() => {
        val delta = ((t * 10 + 1).toLong to (t * 10 + 10).toLong)
          .map(i => (i, i.toDouble)).toDF("k", "v")
        ds.upsert(delta, Seq("k"))
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    assert(ds.toDF.count() == 80, "no duplicates")
    val bad = ds.toDF.filter(col("v") =!= col("k").cast("double")).count()
    assert(bad == 0, s"$bad rows lost their update")
  }

  test("concurrent initial inserts both survive") {
    val ds = LakeDataset.fromDataFrame(spark, Seq((0L, "z")).toDF("k", "s"))
    val t1 = new Thread(() => ds.insert(Seq((1L, "a")).toDF("k", "s")))
    val t2 = new Thread(() => ds.insert(Seq((2L, "b")).toDF("k", "s")))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert(ds.toDF.count() == 3)
  }
}
