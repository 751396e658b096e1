package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.lake.LakeDataset
import graft.model.{Manifest, StorageSpec}

class DatasetSpec extends SparkSpec {
  import spark.implicits._

  test("fromDataFrame creates one part per partition×bucket cell") {
    val li = spark.read.parquet(s"${sf()}/lineitem.parquet")
    val ds = LakeDataset.fromDataFrame(spark, li,
      partitionCols = Seq("l_returnflag"), bucketCols = Seq("l_partkey"), nBuckets = 5)
    val expected = li
      .select(col("l_returnflag"), pmod(col("l_partkey"), lit(5)).as("b"))
      .distinct().count()
    assert(ds.numParts == expected)
    assert(ds.toDF.count() == li.count())
  }

  test("insert with unseen partition value creates a new part") {
    val ds = LakeDataset.fromDataFrame(spark,
      Seq(("A", 1L, 1.0)).toDF("p", "k", "v"), partitionCols = Seq("p"))
    assert(ds.numParts == 1)
    ds.insert(Seq(("B", 2L, 2.0)).toDF("p", "k", "v"))
    assert(ds.numParts == 2)
    assert(ds.toDF.count() == 2)
  }

  test("storage round-trip preserves data and layout") {
    val root = Files.createTempDirectory("graft_ds_spec").toString
    val li = spark.read.parquet(s"${sf()}/lineitem.parquet")
    val ds = LakeDataset.fromDataFrame(spark, li,
      partitionCols = Seq("l_returnflag"), bucketCols = Seq("l_partkey"),
      nBuckets = 5, storage = Some(StorageSpec(root)))
    ds.toStorage()

    // Layout: Hive-style dirs with sorted partition cols + zero-padded bucket
    val dirs = new java.io.File(root).listFiles().map(_.getName).sorted
    assert(dirs.exists(_.startsWith("l_returnflag=")))
    assert(new java.io.File(root, graft.model.Manifest.FileName).exists())

    val back = LakeDataset.fromStorage(spark, root)
    assert(back.numParts == ds.numParts)
    assert(back.toDF.count() == li.count())
    val a = ds.toDF.agg(sum(col("l_extendedprice").cast("decimal(38,2)"))).head().getDecimal(0)
    val b = back.toDF.agg(sum(col("l_extendedprice").cast("decimal(38,2)"))).head().getDecimal(0)
    assert(a == b)
    LakeDataset.deleteRecursively(java.nio.file.Paths.get(root))
  }

  test("save after LAZY load from the same root keeps the data (wipe-before-read)") {
    val root = Files.createTempDirectory("graft_lazysave").toString
    val df = Seq(("A", 1L, 1.0), ("A", 2L, 2.0), ("B", 3L, 3.0)).toDF("p", "k", "v")
    LakeDataset.fromDataFrame(spark, df, partitionCols = Seq("p"),
      storage = Some(StorageSpec(root))).toStorage()

    // Lazy load: part plans read the files under root. Saving again must not
    // wipe the files out from under its own write job.
    val lazyDs = LakeDataset.fromStorage(spark, root, eager = false)
    lazyDs.toStorage()
    assert(lazyDs.toDF.count() == 3, "in-memory views survive the rewrite")

    val back = LakeDataset.fromStorage(spark, root)
    assert(back.toDF.count() == 3)
    assert(back.toDF.agg(sum($"v")).head().getDouble(0) == 6.0)

    // Same again but with a mutation between load and save.
    lazyDs.upsert(Seq(("B", 4L, 4.0)).toDF("p", "k", "v"), Seq("k"))
    lazyDs.toStorage()
    val back2 = LakeDataset.fromStorage(spark, root)
    assert(back2.toDF.count() == 4)
    LakeDataset.deleteRecursively(java.nio.file.Paths.get(root))
  }

  test("empty table round-trips through a manifest-only layout") {
    val root = Files.createTempDirectory("graft_emptysave").toString
    val ds = LakeDataset.fromDataFrame(spark,
      Seq.empty[(String, Long, Double)].toDF("p", "k", "v"),
      partitionCols = Seq("p"), storage = Some(StorageSpec(root)))
    assert(ds.numParts == 0)
    ds.toStorage()
    val back = LakeDataset.fromStorage(spark, root)
    assert(back.numParts == 0)
    assert(back.toDF.count() == 0)
    assert(back.toDF.columns.toSeq == Seq("p", "k", "v"))
    // An empty load is still a usable table: insert works and re-saves.
    back.insert(Seq(("A", 1L, 1.0)).toDF("p", "k", "v"))
    back.toStorage()
    assert(LakeDataset.fromStorage(spark, root).toDF.count() == 1)
    LakeDataset.deleteRecursively(java.nio.file.Paths.get(root))
  }

  test("csv storage round-trip via schema-bearing manifest") {
    val root = Files.createTempDirectory("graft_csv").toString
    val o = spark.read.parquet(s"${sf()}/orders.parquet")
    val ds = LakeDataset.fromDataFrame(spark, o,
      partitionCols = Seq("o_orderstatus"),
      storage = Some(StorageSpec(root, format = "csv", compression = "gzip")))
    ds.toStorage()
    val back = LakeDataset.fromStorage(spark, root)
    assert(back.toDF.schema == o.schema, "csv types must come back via manifest schema")
    assert(back.toDF.count() == o.count())
    val a = o.agg(sum(col("o_totalprice").cast("decimal(38,2)"))).head().getDecimal(0)
    val b = back.toDF.agg(sum(col("o_totalprice").cast("decimal(38,2)"))).head().getDecimal(0)
    assert(a == b)
    LakeDataset.deleteRecursively(java.nio.file.Paths.get(root))
  }

  test("one-pass partitionBy save round-trips above the cell threshold") {
    val root = Files.createTempDirectory("graft_onepass").toString
    val li = spark.read.parquet(s"${sf()}/lineitem.parquet")
    // 3 returnflags x 25 buckets = ~75 cells > OnePassSaveCells -> single job
    val ds = LakeDataset.fromDataFrame(spark, li,
      partitionCols = Seq("l_returnflag"), bucketCols = Seq("l_partkey"),
      nBuckets = 25, storage = Some(StorageSpec(root)))
    assert(ds.numParts > LakeDataset.OnePassSaveCells)
    ds.toStorage()
    val back = LakeDataset.fromStorage(spark, root)
    assert(back.numParts == ds.numParts)
    assert(back.toDF.count() == li.count())
    assert(back.toDF.schema == li.schema, "column order and types must survive")
    val a = li.agg(sum(col("l_extendedprice").cast("decimal(38,2)"))).head().getDecimal(0)
    val b = back.toDF.agg(sum(col("l_extendedprice").cast("decimal(38,2)"))).head().getDecimal(0)
    assert(a == b)
    LakeDataset.deleteRecursively(java.nio.file.Paths.get(root))
  }

  test("incremental savePart interleaves with the one-pass save layout") {
    val root = Files.createTempDirectory("graft_inc").toString
    val o = spark.read.parquet(s"${sf()}/orders.parquet")
    val ds = LakeDataset.fromDataFrame(spark, o,
      partitionCols = Seq("o_orderstatus"), storage = Some(StorageSpec(root)))
    ds.toStorage() // one-pass partitionBy write
    // mutate ONE cell, save only it — must land in the same directory scheme
    val delta = o.filter(col("o_orderstatus") === "F" && col("o_orderkey") % 11 === 0)
      .withColumn("o_totalprice", col("o_totalprice") + 7)
    ds.upsert(delta, Seq("o_orderkey"))
    val fKey = ds.partKeys.find(_.partValues.exists(_._2 == "F")).get
    ds.savePart(fKey)
    val back = LakeDataset.fromStorage(spark, root)
    assert(back.toDF.count() == o.count(), "no duplicate rows after interleaved saves")
    val got = back.toDF.agg(sum(col("o_totalprice").cast("decimal(38,2)"))).head().getDecimal(0)
    val exp = ds.toDF.agg(sum(col("o_totalprice").cast("decimal(38,2)"))).head().getDecimal(0)
    assert(got == exp, "incrementally saved cell must carry the upsert")
    LakeDataset.deleteRecursively(java.nio.file.Paths.get(root))
  }

  test("manifest round-trips partitions, buckets, storage") {
    val root = Files.createTempDirectory("graft_manifest").toString
    val m = Manifest(List("a", "b"), List("c"), 7, StorageSpec(root, "parquet", "snappy"))
    Manifest.write(m, root)
    assert(Manifest.read(root) == m)
  }

  test("partition pruning selects only matching parts") {
    val li = spark.read.parquet(s"${sf()}/lineitem.parquet")
    val ds = LakeDataset.fromDataFrame(spark, li,
      partitionCols = Seq("l_returnflag"), bucketCols = Seq("l_partkey"), nBuckets = 5)
    val pruned = ds.prunedDF(Map("l_returnflag" -> "R"))
    val direct = li.filter(col("l_returnflag") === "R")
    assert(pruned.count() == direct.count())
    // The pruned plan unions only the R-cells (≤ nBuckets parts), not all parts.
    val planParts = pruned.queryExecution.optimizedPlan.collectLeaves().size
    assert(planParts <= 5, s"pruned plan has $planParts leaves, expected <= 5")
  }

  test("filters over the union view push into parquet scans (reference test.py behavior)") {
    val root = Files.createTempDirectory("graft_pushdown").toString
    val li = spark.read.parquet(s"${sf()}/lineitem.parquet")
    val ds = LakeDataset.fromDataFrame(spark, li,
      partitionCols = Seq("l_returnflag"),
      storage = Some(StorageSpec(root)))
    ds.toStorage()
    val back = LakeDataset.fromStorage(spark, root)
    val q = back.toDF.filter(col("l_quantity") > 49).select("l_orderkey", "l_quantity")
    val physical = q.queryExecution.executedPlan.toString
    assert(physical.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,49"),
      s"expected pushed filter in plan:\n$physical")
    // Column pruning: scan must read only the two projected columns (+filter col)
    assert(physical.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"),
      s"expected pruned read schema in plan:\n$physical")
    LakeDataset.deleteRecursively(java.nio.file.Paths.get(root))
  }

  test("bucket pruning scans only the matching bucket's cells") {
    val li = spark.read.parquet(s"${sf()}/lineitem.parquet")
    val ds = LakeDataset.fromDataFrame(spark, li,
      partitionCols = Seq("l_returnflag"), bucketCols = Seq("l_partkey"), nBuckets = 5)
    val key = 42L
    val pruned = ds.bucketPrunedDF(key).filter(col("l_partkey") === key)
    val direct = li.filter(col("l_partkey") === key)
    assert(pruned.count() == direct.count())
    // only one bucket id (x3 partitions) contributes to the pruned plan
    val leaves = pruned.queryExecution.optimizedPlan.collectLeaves().size
    assert(leaves <= 3, s"expected <=3 leaves after bucket pruning, got $leaves")
  }

  test("concurrent inserts and reads: every row lands exactly once, counters agree") {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val ds = LakeDataset.fromDataFrame(spark,
      Seq((0L, "p0", 0.0)).toDF("k", "part", "v"), partitionCols = Seq("part"))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      // 4 writers × 5 single-row inserts, interleaved with reads: the
      // dataset monitor serializes routing/plan swaps, so no insert is
      // lost and no read sees a torn multi-cell update.
      val writers = (1 to 4).map { t =>
        Future {
          (0 until 5).foreach { i =>
            ds.insert(Seq((t * 1000L + i, s"p$t", 1.0)).toDF("k", "part", "v"))
          }
        }
      }
      val reader = Future {
        (0 until 5).foreach(_ => assert(ds.toDF.count() >= 1L))
      }
      Await.result(Future.sequence(writers :+ reader), Duration.Inf)
    } finally pool.shutdown()
    assert(ds.toDF.count() == 21L)
    assert(ds.toDF.select("k").distinct().count() == 21L)
    assert(ds.rowsCount == 21L)
  }

  test("insertWritten refuses a colliding cell instead of corrupting it") {
    val root = java.nio.file.Files.createTempDirectory("graft_iw_col").toString
    val ds = graft.lake.LakeDataset.forStorage(spark,
      partitionCols = Seq("part"), bucketCols = Nil, nBuckets = 0,
      bloomCols = Nil, storage = graft.model.StorageSpec(root))
    ds.insertWritten(Seq((1L, "p0", 1.0)).toDF("k", "part", "v"))
    assert(ds.toDF.count() == 1L)
    // Same cell again: the append-mode write cannot merge a directory, so
    // the router must refuse BEFORE any file lands — a post-write refusal
    // would leave the refused rows inside the existing directory for every
    // later disk-backed read.
    val e = intercept[Exception] {
      ds.insertWritten(Seq((2L, "p0", 2.0)).toDF("k", "part", "v"))
    }
    assert(e.getMessage.contains("already exists"), e.getMessage)
    assert(ds.toDF.count() == 1L, "refused batch must leave zero rows behind")
    assert(ds.toDF.select("k").as[Long].collect().toSeq == Seq(1L))
    // A FRESH cell is fine, and the refused batch left no partial state
    // registered (the table still reads consistently).
    ds.insertWritten(Seq((3L, "p1", 3.0)).toDF("k", "part", "v"))
    assert(ds.toDF.select("part").distinct().count() == 2L)
    // NULL bucket keys are refused up front on bucketed layouts (writer
    // null directory and catalog sentinel cell disagree on the path).
    val root2 = java.nio.file.Files.createTempDirectory("graft_iw_nb").toString
    val bds = graft.lake.LakeDataset.forStorage(spark,
      partitionCols = Nil, bucketCols = Seq("k"), nBuckets = 4,
      bloomCols = Nil, storage = graft.model.StorageSpec(root2))
    val e2 = intercept[Exception] {
      bds.insertWritten(Seq((Option.empty[java.lang.Long], 1.0))
        .toDF("k", "v"))
    }
    assert(e2.getMessage.contains("NULL bucket"), e2.getMessage)
  }

  test("insertWritten: unsorted multi-column specs and escapable values land at relPath") {
    val root = java.nio.file.Files.createTempDirectory("graft_iw_esc").toString
    // Partition columns DECLARED out of name order, values Spark's writer
    // percent-encodes (colon, percent, equals): the writer's directory and
    // PartKey.relPath must agree BEFORE registration — under the old
    // home-grown escaping ('_' substitution, declaration-order nesting) the
    // mismatch surfaced only after the append had written files.
    val ds = graft.lake.LakeDataset.forStorage(spark,
      partitionCols = Seq("zone", "area"), bucketCols = Nil, nBuckets = 0,
      bloomCols = Nil, storage = graft.model.StorageSpec(root))
    ds.insertWritten(Seq(
      (1L, "b:2", "a 1", 1.0),
      (2L, "d%x", "c=4", 2.0)).toDF("k", "zone", "area", "v"))
    assert(ds.toDF.count() == 2L)
    ds.partKeys.foreach { k =>
      assert(java.nio.file.Files.isDirectory(
        java.nio.file.Paths.get(s"$root/${k.relPath}")),
        s"registered cell not on disk at its relPath: ${k.relPath}")
    }
    // Values round-trip UNESCAPED through the manifest + directory parse.
    val back = graft.lake.LakeDataset.fromStorage(spark, root)
    assert(back.toDF.select("zone", "area").as[(String, String)].collect().toSet ==
      Set(("b:2", "a 1"), ("d%x", "c=4")))
    // Timestamp partition values render differently driver-side vs in the
    // writer (trailing ".0") — refused before any file lands.
    val root2 = java.nio.file.Files.createTempDirectory("graft_iw_ts").toString
    val tds = graft.lake.LakeDataset.forStorage(spark,
      partitionCols = Seq("ts"), bucketCols = Nil, nBuckets = 0,
      bloomCols = Nil, storage = graft.model.StorageSpec(root2))
    val e3 = intercept[Exception] {
      tds.insertWritten(
        Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1.0))
          .toDF("k", "ts", "v"))
    }
    assert(e3.getMessage.contains("timestamp partition column"), e3.getMessage)
    import scala.jdk.CollectionConverters._
    val leftover = java.nio.file.Files.list(java.nio.file.Paths.get(root2))
      .iterator().asScala.filter(_.getFileName.toString.startsWith("ts=")).toList
    assert(leftover.isEmpty, s"refused batch wrote partition dirs: $leftover")
  }

  test("rows counter matches data after insert; schemaInfo sane") {
    val ds = LakeDataset.fromDataFrame(spark, Seq((1L, "x")).toDF("k", "s"))
    ds.insert(Seq((2L, "y"), (3L, "z")).toDF("k", "s"))
    assert(ds.rowsCount == 3)
    val (cols, rows, parts) = ds.schemaInfo
    assert(cols == List("k" -> "bigint", "s" -> "string"))
    assert(rows == 3 && parts == 1)
  }
}
