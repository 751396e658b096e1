package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

import graft.lake.LakeDataset
import graft.model.StorageSpec

/** Cluster-mode snapshot seam: with `spark.graft.snapshot.mode=reliable`
  * every compaction path (whole-table, batch split, per-part materialize,
  * eager load) spills to parquet instead of `localCheckpoint` — no state
  * pinned to an executor — while the two-phase ledger still releases
  * superseded generations.
  */
class ReliableSnapshotSpec extends SparkSpec {

  private def listGens(base: String): Set[String] =
    Files.walk(Paths.get(base)).iterator().asScala
      .filter(p => Files.isDirectory(p) && p.getFileName.toString.startsWith("gen-"))
      .map(_.toString).toSet

  private def withReliable[A](base: String)(body: => A): A = {
    spark.conf.set("spark.graft.snapshot.mode", "reliable")
    spark.conf.set("spark.graft.snapshot.dir", base)
    try body
    finally {
      spark.conf.unset("spark.graft.snapshot.mode")
      spark.conf.unset("spark.graft.snapshot.dir")
    }
  }

  test("reliable lifecycle: correct results, zero checkpoint RDDs, generations released") {
    val base = Files.createTempDirectory("graft_rel").toString
    withReliable(base) {
      val o = spark.read.parquet(s"${sf()}/orders.parquet")
      val ds = LakeDataset.fromDataFrame(spark, o,
        partitionCols = Seq("o_orderstatus"), bucketCols = Seq("o_custkey"), nBuckets = 3)

      (1 to 5).foreach { i =>
        ds.upsert(o.filter(col("o_orderkey") % 50 === i)
          .withColumn("o_totalprice", col("o_totalprice") + 1000), Seq("o_orderkey"))
      }
      ds.delete(o.filter(col("o_orderkey") % 97 === 0).select("o_orderkey"),
        Seq("o_orderkey"))
      // crossing the mutation threshold compacts on read — in reliable mode
      // the snapshot is parquet, so the live plan holds NO checkpoint RDDs
      val live = ds.toDF
      assert(live.count() === o.filter(col("o_orderkey") % 97 =!= 0).count())
      assert(Bridge.checkpointRdds(live).isEmpty,
        "reliable mode must not pin blocks via localCheckpoint")
      // an upserted row carries its new value through the reliable merge
      val bumped = live.filter(col("o_orderkey") % 50 === 1).select("o_totalprice")
        .as[Double](org.apache.spark.sql.Encoders.scalaDouble).collect()
      val orig = o.filter(col("o_orderkey") % 50 === 1).select("o_totalprice")
        .as[Double](org.apache.spark.sql.Encoders.scalaDouble).collect()
      assert(bumped.sorted.sameElements(orig.map(_ + 1000).sorted))

      val gensFirst = listGens(base)
      assert(gensFirst.nonEmpty, "reliable snapshots must land under the configured dir")

      // second generation: more mutations + a compacting read + materialize
      // must RELEASE superseded spill directories (the ledger works on
      // directory refs exactly as it does on RDD refs)
      (6 to 10).foreach { i =>
        ds.upsert(o.filter(col("o_orderkey") % 50 === i), Seq("o_orderkey"))
      }
      ds.toDF.count()
      ds.materialize()
      val gensSecond = listGens(base)
      assert((gensFirst -- gensSecond).nonEmpty,
        s"superseded generations must be deleted (first=${gensFirst.size}, " +
          s"second=${gensSecond.size}, surviving=${(gensFirst & gensSecond).size})")
    }
  }

  test("reliable storage roundtrip: save, eager reload, counters and plans stay parquet-backed") {
    val base = Files.createTempDirectory("graft_rel2").toString
    withReliable(base) {
      val li = spark.read.parquet(s"${sf()}/lineitem.parquet")
      val root = Files.createTempDirectory("graft_rel_store").toString
      val ds = LakeDataset.fromDataFrame(spark, li,
        partitionCols = Seq("l_returnflag"),
        storage = Some(StorageSpec(root)))
      ds.toStorage()
      val back = LakeDataset.fromStorage(spark, root, eager = true)
      assert(back.toDF.count() === li.count())
      assert(Bridge.checkpointRdds(back.toDF).isEmpty)
    }
  }
}
