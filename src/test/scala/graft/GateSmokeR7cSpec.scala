package graft

import org.apache.spark.sql.functions._

/** Round-7-continuation gate queries vs their own oracle SQL, executed by
  * Spark over the raw tables (same drift-catcher as GateSmokeR7Spec —
  * the driver's hash gate sorts columns by NAME, so an alias mismatch
  * fails even with identical values). `lake_validated_ingest` is absent:
  * its oracle uses DuckDB's `regexp_matches`, which Spark SQL does not
  * parse — it is covered by the driver gate and DiffSpec.
  */
class GateSmokeR7cSpec extends SparkSpec {

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
    "lake_stats_meta", "lake_sql_stats_meta", "lake_stats_meta_grouped",
    "lake_sql_stats_meta_filtered", "lake_dpp_join", "export_shards",
    "lake_delete_where", "lake_update_where", "lake_sql_dml",
    "lake_sql_merge", "lake_sql_copy", "lake_sql_optimize", "lake_relayout",
    "lake_diff", "curate_budget_select", "pipeline_curate"))
    test(s"$q matches its oracle") { check(q) }
}
