package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Fixtures
import graft.operators.ExactDedupIndex

/** Stage breakdown of the `dedup_incr_exact` bench query: open, the two
  * addBatch calls (with insertWritten's internal stages attributed via
  * `spark.graft.lake.profile`), and the gate's final sorted collect. Run
  * twice — the first iteration pays codegen for the plan shapes, the
  * second is the steady-state per-batch cost the bench floor is made of.
  */
object ExProfile {
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
      println(f"[exprofile] $label%-20s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
      r
    }

    val d = Fixtures.table(spark, sfDir, "documents").select("doc_id", "text")
    d.count() // warm-up

    spark.conf.set("spark.graft.lake.profile", "true")
    (1 to 2).foreach { i =>
      val root = java.nio.file.Files.createTempDirectory(s"graft_exp$i").toString
      val nb = sys.env.getOrElse("EX_NB", "32").toInt
      val idx = time(s"open#$i")(ExactDedupIndex.open(spark, root, nBuckets = nb))
      val b1 = d.filter(col("doc_id") < 250)
      val noisy = d.filter(col("doc_id") < 250 && col("doc_id") % 9 === 0)
        .select((col("doc_id") + 1000000).as("doc_id"),
          concat(upper(col("text")), lit("  !!")).as("text"))
      val b2 = d.filter(col("doc_id") >= 250).unionByName(noisy)
      val r1 = time(s"addBatch1#$i")(idx.addBatch(b1, "text", "doc_id"))
      time(s"collect1#$i")(r1.count())
      val r2 = time(s"addBatch2#$i")(idx.addBatch(b2, "text", "doc_id"))
      time(s"collect2#$i")(r2.count())
    }
    spark.stop()
  }
}
