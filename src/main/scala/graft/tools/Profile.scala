package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Fixtures
import graft.operators.Dedup

/** Ad-hoc stage profiler for the heavy operators (not part of the driver
  * contract). `runMain graft.tools.Profile [sfDir]`.
  */
object Profile {
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
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }

    spark.read.parquet(s"$sfDir/lineitem.parquet").count() // warm-up

    val corpus = Fixtures.nearDupDocuments(spark, sfDir).localCheckpoint(true)
    println(s"[profile] corpus rows: ${corpus.count()}")

    val banded = Dedup.minhashBands(corpus, "text", "doc_id", 32, 8, 3).cache()
    time("minhash bands")(banded.count())

    val cands = banded.as("x")
      .join(banded.as("y"), col("x.band") === col("y.band") && col("x.bh") === col("y.bh"))
      .filter(col("x.doc") < col("y.doc"))
      .select(col("x.doc").as("doc_a"), col("y.doc").as("doc_b"))
      .distinct().cache()
    val nCands = time("band join + distinct")(cands.count())
    println(s"[profile] candidates: $nCands")

    time("shingle rows") {
      Dedup.shingleRows(corpus, "text", "doc_id", 3).count()
    }

    val verified = time("jaccard verify") {
      Dedup.jaccardVerify(cands, corpus, "text", "doc_id", 3)
        .filter(col("jaccard") >= 0.5).count()
    }
    println(s"[profile] verified pairs: $verified")

    time("end-to-end minhashDedup") {
      Dedup.minhashDedup(corpus, "text", "doc_id", threshold = 0.5).count()
    }
    (1 to 4).foreach { i =>
      time(s"end-to-end RAW corpus run $i") {
        Dedup.minhashDedup(Fixtures.nearDupDocuments(spark, sfDir),
          "text", "doc_id", threshold = 0.5).count()
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
