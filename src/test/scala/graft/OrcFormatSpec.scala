package graft

import graft.lake.LakeDataset
import graft.model.StorageSpec
import org.apache.spark.sql.functions._

/** The StorageSpec format axis is generic — ORC exercises a second columnar
  * built-in end to end (write per-cell, manifest, rediscovery, load, zone
  * stats), proving the lake layer holds no parquet-only assumptions.
  */
class OrcFormatSpec extends SparkSpec {

  test("orc lake round trip: layout, content, pruning") {
    val li = Fixtures.table(spark, sf(), "lineitem")
    val root = java.nio.file.Files.createTempDirectory("graft_orc").toString
    try {
      val ds = LakeDataset.fromDataFrame(spark, li,
        partitionCols = Seq("l_returnflag"), bucketCols = Seq("l_partkey"),
        nBuckets = 5,
        storage = Some(StorageSpec(root, format = "orc", compression = "zstd")))
      ds.toStorage()

      // data files are ORC, laid out hive-style
      val files = java.nio.file.Files.walk(java.nio.file.Paths.get(root))
        .iterator()
      val orcFiles = scala.jdk.CollectionConverters.IteratorHasAsScala(files)
        .asScala.filter(p => java.nio.file.Files.isRegularFile(p))
        .map(_.getFileName.toString).filter(_.endsWith(".orc")).toList
      assert(orcFiles.nonEmpty, "no .orc data files written")

      val back = LakeDataset.fromStorage(spark, root)
      val want = li.groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(col("l_extendedprice").cast("decimal(38,2)")).as("total"))
        .orderBy("l_returnflag").collect().toSeq
      val got = back.toDF.groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(col("l_extendedprice").cast("decimal(38,2)")).as("total"))
        .orderBy("l_returnflag").collect().toSeq
      assert(got == want)

      // partition pruning still works over the reloaded orc layout
      val r = back.prunedDF(Map("l_returnflag" -> "R"))
        .agg(count(lit(1))).collect()(0).getLong(0)
      assert(r == li.filter(col("l_returnflag") === "R").count())
    } finally LakeDataset.deleteRecursively(java.nio.file.Paths.get(root))
  }
}
