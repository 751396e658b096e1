package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

import graft.lake.LakeDataset

/** Zone-seeded top-k (LakeDataset.topK): the ordered-limit answer equals the
  * full sort on every path, and the final phase plans only the cells whose
  * zones can reach the k-th value.
  */
class TopKSpec extends SparkSpec {

  private def orders = spark.read.parquet(s"${sf()}/orders.parquet")

  /** Storage-backed lake in disjoint o_orderkey ranges — the layout where
    * the extreme cells certify the threshold and prune the rest.
    */
  private def zonedLake(tag: String): LakeDataset = {
    val root = java.nio.file.Files.createTempDirectory(s"graft_topk_$tag").toString
    val o = orders.withColumn("o_batch", (col("o_orderkey") / 100).cast("int"))
    val ds = LakeDataset.fromDataFrame(spark, o, partitionCols = Seq("o_batch"),
      storage = Some(graft.model.StorageSpec(root)))
    ds.toStorage()
    LakeDataset.fromStorage(spark, root)
  }

  private def truth(k: Int, asc: Boolean, cols: Seq[String]): Seq[Seq[Any]] = {
    val sorts = cols.map(c => if (asc) col(c).asc else col(c).desc)
    orders.filter(col(cols.head).isNotNull).sort(sorts: _*).limit(k)
      .select(cols.map(col): _*).collect().map(_.toSeq).toSeq
  }

  test("desc top-k equals the full sort and plans only the extreme cells") {
    val ds = zonedLake("desc")
    val total = ds.numParts
    assert(total >= 8) // the layout must give pruning something to skip
    val got = ds.topK("o_orderkey", 10)
    assert(got.select("o_orderkey").collect().map(_.getLong(0)).toSeq ==
      truth(10, asc = false, Seq("o_orderkey")).map(_.head))
    // Pruning pin: the final plan reads only the cells whose o_orderkey
    // zone reaches the observed 10th value — the top cell (500 rows/cell
    // covers k=10), not the table.
    val dirs = Bridge.scanRootPaths(got)
    assert(dirs.nonEmpty && dirs.size <= 2, s"expected <=2 cell dirs, got $dirs")
  }

  test("asc top-k with tie-break equals the full sort") {
    val ds = zonedLake("asc")
    val got = ds.topK("o_totalprice", 25, asc = true, tieBreak = Seq("o_orderkey"))
      .select("o_totalprice", "o_orderkey").collect().map(_.toSeq).toSeq
    val want = orders.sort(col("o_totalprice").asc, col("o_orderkey").asc).limit(25)
      .select("o_totalprice", "o_orderkey").collect().map(_.toSeq).toSeq
    assert(got == want)
  }

  test("uncorrelated column still answers exactly (prune may keep everything)") {
    val ds = zonedLake("uncorr")
    val got = ds.topK("o_totalprice", 7, asc = false, tieBreak = Seq("o_orderkey"))
      .select("o_totalprice", "o_orderkey").collect().map(_.toSeq).toSeq
    val want = orders.sort(col("o_totalprice").desc, col("o_orderkey").desc).limit(7)
      .select("o_totalprice", "o_orderkey").collect().map(_.toSeq).toSeq
    // tieBreak follows the primary direction (desc) in topK.
    assert(got == want)
  }

  test("untracked column type falls back to the plain ordered limit") {
    val ds = zonedLake("str")
    // Strings carry no zones by design (ZoneMap.zoneable) — topK must give
    // the plain answer through the fallback.
    val got = ds.topK("o_orderpriority", 5, asc = true, tieBreak = Seq("o_orderkey"))
      .select("o_orderpriority", "o_orderkey").collect().map(_.toSeq).toSeq
    val want = orders.sort(col("o_orderpriority").asc, col("o_orderkey").asc)
      .limit(5).select("o_orderpriority", "o_orderkey").collect().map(_.toSeq).toSeq
    assert(got == want)
  }

  test("NULLs in the ranking column are excluded by contract") {
    val o = orders.withColumn("v",
      when(col("o_orderkey") % 3 === 0, col("o_orderkey")).otherwise(lit(null)))
    val ds = LakeDataset.fromDataFrame(spark,
      o.withColumn("o_batch", (col("o_orderkey") / 500).cast("int")),
      partitionCols = Seq("o_batch"))
    val got = ds.topK("v", 8).select("v").collect().map(_.getLong(0)).toSeq
    val want = o.filter(col("v").isNotNull).sort(col("v").desc).limit(8)
      .select("v").collect().map(_.getLong(0)).toSeq
    assert(got == want)
  }

  test("k larger than the table returns everything ordered") {
    val ds = zonedLake("bigk")
    val n = orders.count().toInt
    val got = ds.topK("o_orderkey", n + 50)
    assert(got.count() == n)
  }
}
