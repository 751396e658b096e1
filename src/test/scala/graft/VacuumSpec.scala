package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.lake.LakeDataset
import graft.model.StorageSpec

class VacuumSpec extends SparkSpec {
  import spark.implicits._

  private def base = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "a", 30.0), (4L, null.asInstanceOf[String], 40.0)
  ).toDF("k", "g", "v")

  test("vacuumOrphans deletes nothing on a clean save/load round trip") {
    val root = Files.createTempDirectory("graft_vac1").toString
    LakeDataset.fromDataFrame(spark, base,
      partitionCols = Seq("g"), storage = Some(StorageSpec(root))).toStorage()
    val t = LakeDataset.fromStorage(spark, root)
    assert(t.vacuumOrphans().isEmpty)
    assert(t.toDF.count() == 4)
    // Null partition value lives in Hive's default-partition dir and must
    // be recognized as live, not vacuumed.
    assert(LakeDataset.fromStorage(spark, root).toDF.count() == 4)
  }

  test("vacuumOrphans removes exactly the planted junk; reload is clean") {
    val root = Files.createTempDirectory("graft_vac2").toString
    val ds = LakeDataset.fromDataFrame(spark, base,
      partitionCols = Seq("g"), storage = Some(StorageSpec(root)))
    ds.toStorage()
    // A crashed writer's leftover cell: directory discovery would walk it
    // back into the table on the next load — the WRITER's catalog (which
    // never admitted the cell) is what can tell it apart and delete it.
    Seq((99L, 99.0)).toDF("k", "v").write
      .parquet(Paths.get(root, "g=zz_crashed").toString)
    assert(LakeDataset.fromStorage(spark, root).toDF.count() == 5,
      "discovery walks the junk cell in")
    val deleted = ds.vacuumOrphans()
    assert(deleted == List("g=zz_crashed"))
    assert(LakeDataset.fromStorage(spark, root).toDF.count() == 4)
    assert(ds.toDF.count() == 4)
  }

  test("vacuumOrphans on a bucketed layout keeps every live bucket cell") {
    val root = Files.createTempDirectory("graft_vac3").toString
    val src = (1L to 200L).map(i => (i, s"s$i")).toDF("k", "s")
    LakeDataset.fromDataFrame(spark, src,
      bucketCols = Seq("k"), nBuckets = 8,
      storage = Some(StorageSpec(root))).toStorage()
    val t = LakeDataset.fromStorage(spark, root)
    assert(t.vacuumOrphans().isEmpty)
    assert(t.toDF.count() == 200)
  }
}
