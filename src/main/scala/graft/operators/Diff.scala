package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keyed table diff — the data-engineering "what changed between these two
  * snapshots/runs" operator (the reference has a TIME-ordered change feed;
  * this is the SET-ordered complement for tables with no shared history:
  * two export runs, a replica vs its source, yesterday's snapshot vs
  * today's).
  *
  * One full-outer join on the keys classifies every key as `added` (right
  * only), `removed` (left only), `changed` (both sides, any compared
  * column differs under null-safe equality), or `unchanged`. Scale shape:
  * one key-partitioned shuffle join — the same cost as the engine's own
  * upsert merge; no collect, no window.
  */
object Diff {

  /** Per-key diff rows: key columns + `diff_status` + (for `changed`) the
    * number of differing compared columns. `compareCols` defaults to every
    * shared non-key column.
    */
  def diffTables(left: DataFrame, right: DataFrame, keys: Seq[String],
      compareCols: Seq[String] = Nil): DataFrame = {
    require(keys.nonEmpty, "diff needs key columns")
    val cols =
      if (compareCols.nonEmpty) compareCols
      else left.columns.filter(right.columns.contains).filterNot(keys.contains).toSeq
    val l = left.select((keys ++ cols).map(col): _*).alias("l")
      .withColumn("__l", lit(1))
    val r = right.select((keys ++ cols).map(col): _*).alias("r")
      .withColumn("__r", lit(1))
    val cond = keys.map(k => col(s"l.$k") === col(s"r.$k")).reduce(_ && _)
    val joined = l.join(r, cond, "full_outer")
    val nDiff: Column =
      if (cols.isEmpty) lit(0)
      else cols.map(c =>
        when(!(col(s"l.$c") <=> col(s"r.$c")), 1).otherwise(0))
        .reduce(_ + _)
    joined.select(
      keys.map(k => coalesce(col(s"l.$k"), col(s"r.$k")).as(k)) ++ Seq(
        when(col("__l").isNull, lit("added"))
          .when(col("__r").isNull, lit("removed"))
          .when(nDiff > 0, lit("changed"))
          .otherwise(lit("unchanged")).as("diff_status"),
        when(col("__l").isNotNull && col("__r").isNotNull, nDiff)
          .otherwise(lit(null)).as("n_diff_cols")): _*)
  }

  /** The diff rolled up to one row per status — the usual first question. */
  def diffSummary(left: DataFrame, right: DataFrame, keys: Seq[String],
      compareCols: Seq[String] = Nil): DataFrame =
    diffTables(left, right, keys, compareCols)
      .groupBy(col("diff_status")).agg(count(lit(1)).as("n"))
}
