package graft

import org.apache.spark.sql.functions._

/** Round-7 gate queries vs their own oracle SQL, executed by Spark over the
  * raw tables — catches column-name/type drift before the driver's DuckDB
  * compare (the hash gate sorts columns by NAME, so an alias mismatch fails
  * even with identical values).
  */
class GateSmokeR7Spec extends SparkSpec {

  private def check(name: String): Unit = {
    val dir = sf()
    val got = SparkEntry.queries(name)(spark, dir)
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem").foreach { t =>
      Fixtures.table(spark, dir, t).createOrReplaceTempView(t)
    }
    val want = spark.sql(SparkEntry.oracleSql(name))
    assert(got.columns.sorted.toSeq == want.columns.sorted.toSeq,
      s"$name column names: ${got.columns.toSeq} vs ${want.columns.toSeq}")
    // The driver's hash gate sorts rows as well as columns — compare sorted.
    val g = got.select(got.columns.sorted.map(col): _*)
      .collect().toSeq.sortBy(_.toString)
    val w = want.select(want.columns.sorted.map(col): _*)
      .collect().toSeq.sortBy(_.toString)
    assert(g == w, s"$name: ${g.take(3)} vs ${w.take(3)}")
  }

  test("lake_orc_roundtrip matches its oracle") { check("lake_orc_roundtrip") }
  test("lake_zorder_pruning matches its oracle") { check("lake_zorder_pruning") }
  test("lake_mat_view matches its oracle") { check("lake_mat_view") }
  test("lake_change_feed matches its oracle") { check("lake_change_feed") }
  test("lake_time_travel matches its oracle") { check("lake_time_travel") }
}
