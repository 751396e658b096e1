package graft

import org.apache.spark.sql.SparkSession

/** Quick end-to-end smoke: run `SparkEntry.entry` on sf0.001 (the driver's
  * own smoke contract — rows > 0) plus a couple of failure-path probes.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.buffer.pageSize", "2m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val df = SparkEntry.entry(spark)
    val n = df.count()
    println(s"ENTRY_ROWS=$n")
    df.show(truncate = false)
    require(n > 0, "entry() must return rows")

    // Probe: loading a dataset from a dir with no manifest fails cleanly.
    try { lake.LakeDataset.fromStorage(spark, "/tmp/nonexistent_graft_dir") }
    catch { case e: Exception => println(s"PROBE_FROMSTORAGE_ERR=${e.getClass.getSimpleName}") }

    // Probe: upsert on a key column that doesn't exist fails cleanly.
    try {
      val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      val ds = lake.LakeDataset.fromDataFrame(spark, o)
      ds.upsert(o.limit(10), Seq("no_such_col"))
    } catch {
      case e: Exception =>
        println(s"PROBE_BADKEY_ERR=${e.getClass.getSimpleName}: ${e.getMessage.linesIterator.next().take(120)}")
    }
    // Probe: IPC bytes written here are validated cross-language (pyarrow)
    // by the verify flow.
    val ipc = sources.ArrowInterchange.toIpcBytes(
      spark.read.parquet("/root/testdata/sf0.001/nation.parquet"))
    java.nio.file.Files.write(java.nio.file.Paths.get("/tmp/graft_ipc_sample.arrow"), ipc)
    println(s"PROBE_IPC_BYTES=${ipc.length}")

    spark.stop()
  }
}
