package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.lake.LakeDataset
import graft.model.StorageSpec

/** The `arrowipc` FileFormat: the reference's Format::Ipc persistence
  * (storage.rs:13-21) as a distributed Spark datasource — write/read round
  * trips, codec handling, partition-directory recovery, column pruning,
  * schema evolution nulls, and the lake storage integration.
  */
class ArrowIpcFormatSpec extends SparkSpec {
  import spark.implicits._

  test("flat round trip, zstd and uncompressed, bit-equal data") {
    val df = spark.read.parquet(s"${sf()}/orders.parquet")
    for (codec <- Seq("zstd", "none")) {
      val dir = Files.createTempDirectory(s"graft_ipc_$codec").toString
      df.write.mode("overwrite").format("arrowipc")
        .option("compression", codec).save(dir)
      val back = spark.read.format("arrowipc").load(dir)
      assert(back.schema === df.schema)
      assert(back.count() === df.count())
      assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty)
    }
  }

  test("array columns (embeddings) survive the IPC round trip") {
    val e = spark.read.parquet(s"${sf()}/embeddings.parquet")
    val dir = Files.createTempDirectory("graft_ipc_arr").toString
    e.write.mode("overwrite").format("arrowipc").save(dir)
    val back = spark.read.format("arrowipc").load(dir)
    assert(back.schema === e.schema)
    val a = e.orderBy("vec_id").select("embedding").as[Seq[Float]].collect()
    val b = back.orderBy("vec_id").select("embedding").as[Seq[Float]].collect()
    assert(a.zip(b).forall { case (x, y) => x == y })
  }

  test("partitionBy layout recovers partition columns; pruning reads one dir") {
    val df = spark.read.parquet(s"${sf()}/orders.parquet")
    val dir = Files.createTempDirectory("graft_ipc_part").toString
    df.write.mode("overwrite").format("arrowipc").partitionBy("o_orderstatus").save(dir)
    val back = spark.read.format("arrowipc").option("basePath", dir).load(dir)
    assert(back.count() === df.count())
    val one = back.filter(col("o_orderstatus") === "F")
    assert(one.count() === df.filter(col("o_orderstatus") === "F").count())
    // partition pruning: only the one directory's files plan
    val scanned = one.queryExecution.executedPlan.collectLeaves().head
      .asInstanceOf[org.apache.spark.sql.execution.FileSourceScanExec]
      .selectedPartitions.toPartitionArray.map(_.toPath.toString).toSeq
    assert(scanned.nonEmpty && scanned.forall(_.contains("o_orderstatus=F")))
  }

  test("column pruning and schema-evolution nulls") {
    val df = Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("id", "s", "v")
    val dir = Files.createTempDirectory("graft_ipc_prune").toString
    df.write.mode("overwrite").format("arrowipc").save(dir)
    // prune to a subset (reader selects only those vectors)
    val sel = spark.read.format("arrowipc").load(dir).select("v", "id")
    assert(sel.as[(Double, Long)].collect().toSet == Set((10.0, 1L), (20.0, 2L)))
    // a column the files don't have reads as nulls (parquet semantics)
    val evolved = spark.read
      .schema("id BIGINT, s STRING, v DOUBLE, added INT")
      .format("arrowipc").load(dir)
    assert(evolved.select("added").as[Option[Int]].collect().forall(_.isEmpty))
    assert(evolved.select("id").as[Long].collect().toSet == Set(1L, 2L))
  }

  test("lake storage in arrowipc format: save, reload, mutate, resave") {
    val li = spark.read.parquet(s"${sf()}/lineitem.parquet")
    val root = Files.createTempDirectory("graft_ipc_lake").toString
    val ds = LakeDataset.fromDataFrame(spark, li,
      partitionCols = Seq("l_returnflag"), bucketCols = Seq("l_partkey"), nBuckets = 3,
      storage = Some(StorageSpec(root, format = "arrowipc", compression = "zstd")))
    ds.toStorage()
    val back = LakeDataset.fromStorage(spark, root)
    assert(back.toDF.count() === li.count())
    val expect = li.groupBy("l_returnflag").count().as[(String, Long)].collect().toMap
    val got = back.toDF.groupBy("l_returnflag").count().as[(String, Long)].collect().toMap
    assert(got === expect)
    // mutate the reloaded dataset and save a single part incrementally
    back.delete(li.filter(col("l_orderkey") % 101 === 0).select("l_orderkey"),
      Seq("l_orderkey"))
    val expected = li.filter(col("l_orderkey") % 101 =!= 0).count()
    assert(back.toDF.count() === expected)
    back.toStorage()
    assert(LakeDataset.fromStorage(spark, root).toDF.count() === expected)
  }
}
