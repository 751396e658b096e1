package graft

import org.apache.spark.sql.functions._

/** Round-8 gate queries vs their own oracle SQL, executed by Spark over the
  * raw tables — the same alias/type drift-catcher as GateSmokeR7Spec (the
  * driver's hash gate sorts columns by NAME, so a mismatched alias fails
  * even with identical values).
  */
class GateSmokeR8Spec extends SparkSpec {

  private def check(name: String): Unit = {
    val dir = sf()
    val got = SparkEntry.queries(name)(spark, dir)
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents").foreach { t =>
      Fixtures.table(spark, dir, t).createOrReplaceTempView(t)
    }
    val want = spark.sql(SparkEntry.oracleSql(name))
    assert(got.columns.sorted.toSeq == want.columns.sorted.toSeq,
      s"$name column names: ${got.columns.toSeq} vs ${want.columns.toSeq}")
    val g = got.select(got.columns.sorted.map(col): _*)
      .collect().toSeq.sortBy(_.toString)
    val w = want.select(want.columns.sorted.map(col): _*)
      .collect().toSeq.sortBy(_.toString)
    assert(g == w, s"$name: ${g.take(3)} vs ${w.take(3)}")
  }

  for (q <- Seq(
    "lake_stats_sum", "lake_sql_stats_sum", "lake_sql_stats_sum_grouped",
    "lake_sql_time_travel", "lake_sql_zorder", "lake_sql_history",
    "lake_sql_restore",
    "lake_sql_ctas", "lake_sql_clone", "lake_sql_constraint",
    "lake_sql_detail", "lake_sql_analyze", "lake_sql_show_partitions",
    "lake_sql_alter_columns", "lake_sql_matview", "lake_sql_merge_cdc",
    "lake_stats_hybrid", "lake_stats_hybrid_sum", "lake_topk",
    "lake_topk_price", "lake_sql_count_distinct"))
    test(s"$q matches its oracle") { check(q) }
}
