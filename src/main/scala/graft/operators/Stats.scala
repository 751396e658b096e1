package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.lake.LakeDataset

/** Metadata-only table statistics — the lakehouse "answer aggregates from
  * the catalog" property (Delta/Iceberg metadata-only queries; the reference
  * engine maintains per-part row counters for exactly this shape,
  * reference: src/dataset.rs:245-253, but never exposes min/max).
  *
  * [[tableStats]] answers `COUNT(*)` + per-column `MIN`/`MAX` from the
  * dataset's maintained statistics (per-part row counters + zone maps) when
  * they are provably exact — zero Spark jobs, zero file reads, a driver-side
  * fold over the catalog. When any part's stats are not tight (a
  * non-materialized upsert/delete in its history, or a manifest that did
  * not vouch for them) it falls back to ONE aggregation scan producing the
  * identical result. Same schema, same values either way — the fast path is
  * an optimization, never a semantic.
  *
  * At 100 TB: a 10k-cell table's count/min/max is a 10k-entry fold on the
  * driver versus a full-cluster scan — the difference between answering in
  * microseconds from one manifest and spinning up a thousand executors.
  */
object Stats {

  /** One-row frame: `cnt` + (`min_<c>`, `max_<c>`) per requested column. */
  def tableStats(spark: SparkSession, ds: LakeDataset, cols: Seq[String]): DataFrame = {
    val schema = ds.tableSchema
    val outSchema = StructType(
      StructField("cnt", LongType, nullable = false) +:
        cols.flatMap(c => Seq(
          StructField(s"min_$c", schema(c).dataType),
          StructField(s"max_$c", schema(c).dataType))))
    ds.metaStats(cols) match {
      case Some((n, zones)) =>
        // Catalog answer: a LocalRelation-backed frame — the plan contains
        // no scan at all (spec-pinned).
        val row = Row.fromSeq(
          n +: cols.flatMap(c => Seq(zones(c).min.orNull, zones(c).max.orNull)))
        spark.createDataFrame(java.util.Collections.singletonList(row), outSchema)
      case None =>
        // Fallback: one aggregation over the table — identical result.
        val aggs = count(lit(1)).cast(LongType).as("cnt") +:
          cols.flatMap(c => Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
        ds.toDF.agg(aggs.head, aggs.tail: _*)
    }
  }

  /** Whether [[tableStats]] would take the metadata-only path right now. */
  def metaAnswerable(ds: LakeDataset, cols: Seq[String]): Boolean =
    ds.metaStats(cols).isDefined

  /** [[tableStats]] grouped by PARTITION columns: one row per group —
    * group values, `cnt`, (`min_<c>`, `max_<c>`) per requested column.
    * Metadata-only (cells fold by their catalog partition values) when the
    * dataset can vouch; otherwise one real grouped aggregation, identical
    * result.
    */
  def tableStatsBy(spark: SparkSession, ds: LakeDataset,
      groupCols: Seq[String], cols: Seq[String]): DataFrame = {
    val schema = ds.tableSchema
    val outSchema = StructType(
      groupCols.map(g => StructField(g, schema(g).dataType)) ++
        (StructField("cnt", LongType, nullable = false) +:
          cols.flatMap(c => Seq(
            StructField(s"min_$c", schema(c).dataType),
            StructField(s"max_$c", schema(c).dataType)))))
    ds.metaStatsGrouped(groupCols, cols) match {
      case Some(groups) =>
        val rows: java.util.List[Row] = new java.util.ArrayList[Row]()
        groups.foreach { case (vals, cnt, zones) =>
          rows.add(Row.fromSeq(vals ++ (cnt +:
            cols.flatMap(c => Seq(zones(c).min.orNull, zones(c).max.orNull)))))
        }
        spark.createDataFrame(rows, outSchema)
      case None =>
        val aggs = count(lit(1)).cast(LongType).as("cnt") +:
          cols.flatMap(c => Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
        ds.toDF.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
    }
  }
}
