package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.lake.LakePart

/** Stage breakdown of the wide-merge path at ScaleSmoke size (not part of
  * the driver contract). `runMain graft.tools.MergeProfile [sfDir]`.
  */
object MergeProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = sys.env.getOrElse("SPARK_GRAFT_COPIES", "10").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.buffer.pageSize", "2m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[merge] $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }

    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val big = (0 until copies).map { i =>
      li.withColumn("l_orderkey", col("l_orderkey") + lit(i.toLong * 10000000L))
    }.reduce(_ unionByName _)
    val old = time("checkpoint corpus")(big.localCheckpoint(true))
    println(s"[merge] rows: ${old.count()}")

    val keys = Seq("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    val delta0 = old.filter(col("l_orderkey") % 7 === 0)
      .withColumn("l_quantity", col("l_quantity") + 100)
    val delta = time("checkpoint delta")(delta0.localCheckpoint(true))
    println(s"[merge] delta rows: ${delta.count()}")

    val merged = LakePart.upsertJoin(old, delta, keys, Set.empty)
    time("join only (count)")(println(s"[merge]   -> ${merged.count()}"))
    time("join + localCheckpoint") {
      merged.localCheckpoint(true)
    }
    time("join + persist(DISK_SER) + count") {
      val p = LakePart.upsertJoin(old, delta, keys, Set.empty)
        .persist(StorageLevel.MEMORY_AND_DISK_SER)
      p.count()
    }
    val tmp = java.nio.file.Files.createTempDirectory("graft_mergeprof").toString
    val back = time("join + parquet spill write") {
      LakePart.upsertJoin(old, delta, keys, Set.empty)
        .write.mode("overwrite").parquet(s"$tmp/snap")
      spark.read.parquet(s"$tmp/snap")
    }
    time("read spilled snapshot (count)")(println(s"[merge]   -> ${back.count()}"))
    time("aggregate over spilled snapshot") {
      back.groupBy("l_returnflag").agg(count(lit(1))).collect()
    }
    graft.lake.LakeDataset.deleteRecursively(java.nio.file.Paths.get(tmp))
    spark.stop()
  }
}
