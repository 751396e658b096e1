package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Fixtures
import graft.operators.MinhashIndex

/** Stage breakdown of the `dedup_minhash_incr` bench query: bootstrap,
  * copy, open, addBatch — with addBatch's internal stages attributed via
  * `spark.graft.minhash.profile` ([[graft.operators.MinhashIndex]]). The
  * per-batch floor is fixed overhead, so cutting it needs attribution.
  */
object MhProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
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
      println(f"[mhprofile] $label%-20s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
      r
    }

    spark.read.parquet(s"$sfDir/lineitem.parquet").count() // warm-up

    val fixtureRoot = time("bootstrap")(Fixtures.minhashIndexRoot(spark, sfDir))
    val corpus = Fixtures.nearDupDocuments(spark, sfDir)
    val delta = corpus.filter(col("doc_id") >= 100000)

    spark.conf.set("spark.graft.minhash.profile", "true")
    spark.conf.set("spark.graft.lake.profile", "true")
    // Two measured iterations: the first pays codegen for the addBatch
    // plan shapes, the second is the steady-state per-batch cost.
    (1 to 2).foreach { i =>
      val root = java.nio.file.Files.createTempDirectory(s"graft_mhp$i").toString
      time(s"copyDir#$i")(Fixtures.copyDir(fixtureRoot, root))
      val idx = time(s"open#$i")(MinhashIndex.open(spark, root))
      time(s"addBatch#$i")(
        idx.addBatch(delta, "text", "doc_id", threshold = 0.5).count())
    }
    spark.stop()
  }
}
