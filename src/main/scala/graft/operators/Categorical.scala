package graft.operators

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.lake.LakeDataset
import graft.model.StorageSpec

/** Categorical dtype / global string cache — the reference's
  * `enable_string_cache` (reference: src/server.rs:312) gives every
  * DataFrame in the process the SAME string→id mapping so categorical
  * columns compare and join across frames. Spark has no global dtype
  * registry; the Spark-first counterpart is an explicit, PERSISTED
  * dictionary table: encode replaces a string column with a dense integer
  * id, any number of tables encoded against the same cache get consistent
  * ids (the whole point of the reference's global cache), and the
  * dictionary itself is a lake dataset that survives sessions.
  *
  * Id assignment is deterministic: the first batch of values gets
  * `row_number` over the SORTED distinct values; later batches extend the
  * dictionary with `max_id + rank(new sorted distinct)`. Joins do the
  * encode/decode — a dictionary is small next to its data, so Spark
  * broadcasts it and encode costs no shuffle on the data side.
  *
  * At 100 TB: the dictionary is exactly what parquet dictionary pages give
  * per file, LIFTED to dataset scope — an integer join key where strings
  * would have shuffled, and a 4-8 byte column where a 20-byte one was.
  */
final class StringCache private (
    spark: SparkSession, root: String,
    private var dictDs: Option[LakeDataset],
    private var nextBatch: Long) {

  /** Current (value, id) dictionary. */
  def dict: DataFrame = dictDs match {
    case Some(ds) => ds.toDF.select("value", "id")
    case None =>
      import spark.implicits._
      Seq.empty[(String, Long)].toDF("value", "id")
  }

  /** Number of distinct cached values — maintained counters when known
    * (in-session), one small count job otherwise (a freshly reopened cache
    * loads its parts lazily with unknown counters). Ids are dense 1..size,
    * so this is also the max id: extension MUST use this, not a stale or
    * unknown counter, or new ids would collide with persisted ones.
    */
  def size: Long =
    dictDs.map(ds => ds.knownRowsOption.getOrElse(ds.toDF.count())).getOrElse(0L)

  /** Extend the cache with any UNSEEN values of `df.col(colName)` —
    * deterministic: new values rank after all existing ids in sorted order.
    * Returns the number of values added. Ranking is a DISTRIBUTED sort +
    * `zipWithIndex` (partition sizes + offsets, no data movement beyond the
    * sort) — a giant first batch never funnels through one task the way a
    * global row_number window would.
    */
  def extend(df: DataFrame, colName: String): Long = this.synchronized {
    val incoming = df.select(col(colName).cast("string").as("value"))
      .filter(col("value").isNotNull).distinct()
    val fresh = dictDs match {
      case Some(ds) =>
        incoming.join(ds.toDF.select("value"), Seq("value"), "left_anti")
      case None => incoming
    }
    val base = size
    val b = nextBatch
    val stamped = spark.createDataFrame(
      fresh.orderBy("value").rdd.zipWithIndex.map { case (r, i) =>
        org.apache.spark.sql.Row(r.getString(0), base + i + 1, b)
      },
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("value",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("batch",
          org.apache.spark.sql.types.LongType, nullable = false))))
    val n = dictDs match {
      case Some(ds) =>
        ds.insert(stamped)
        ds.partKeys
          .filter(_.partValues.contains("batch" -> nextBatch.toString))
          .foreach(ds.savePart)
        size - base
      case None =>
        val ds = LakeDataset.fromDataFrame(spark, stamped,
          partitionCols = Seq("batch"),
          storage = Some(StorageSpec(s"$root/dict")))
        ds.toStorage()
        dictDs = Some(ds)
        size
    }
    nextBatch += 1
    n
  }

  /** The dictionary side of the encode/decode joins, HINTED broadcast only
    * while the dictionary is PROVABLY small (maintained counters under
    * `spark.graft.cat.broadcastMaxRows`, default 2M). An unconditional hint
    * would force a driver-sized build of an arbitrarily large dictionary —
    * Spark honors explicit hints past every size check — instead of
    * degrading to a shuffle join; above the threshold (or with unknown
    * counters) the planner decides, and AQE still broadcasts when runtime
    * stats allow. Ids are join results either way, so the encoding is
    * byte-identical across strategies (CategoricalSpec pins this).
    */
  private def dictSide(d: DataFrame): DataFrame = {
    val maxRows = spark.conf.get("spark.graft.cat.broadcastMaxRows", "2000000").toLong
    if (dictDs.flatMap(_.knownRowsOption).exists(_ <= maxRows)) broadcast(d) else d
  }

  /** Replace string column `colName` with its dictionary id (extending the
    * cache first, so encode never drops a value). NULL stays NULL — the
    * reference's categorical semantics.
    */
  def encode(df: DataFrame, colName: String): DataFrame = {
    extend(df, colName)
    // internal names so a data column called "value"/"id" can't collide
    val d = dict.select(col("value").as("__graft_cat_val"), col("id").as("__graft_cat_id"))
    df.withColumn("__graft_cat_key", col(colName).cast("string"))
      .join(dictSide(d), col("__graft_cat_key") === col("__graft_cat_val"), "left")
      .drop(colName, "__graft_cat_key", "__graft_cat_val")
      .withColumnRenamed("__graft_cat_id", colName)
  }

  /** Inverse of [[encode]]: restore the string column from ids. */
  def decode(df: DataFrame, colName: String): DataFrame = {
    val d = dict.select(col("value").as("__graft_cat_val"), col("id").as("__graft_cat_id"))
    df.withColumnRenamed(colName, "__graft_cat_lookup")
      .join(dictSide(d), col("__graft_cat_lookup") === col("__graft_cat_id"), "left")
      .drop("__graft_cat_lookup", "__graft_cat_id")
      .withColumnRenamed("__graft_cat_val", colName)
  }
}

object StringCache {

  /** Open the cache at `root`: load persisted state if a prior session
    * saved one, else start empty.
    */
  def open(spark: SparkSession, root: String): StringCache = {
    val hasState = Files.exists(Paths.get(s"$root/dict/_manifest.json"))
    if (!hasState) new StringCache(spark, root, None, 0L)
    else {
      val ds = LakeDataset.fromStorage(spark, s"$root/dict")
      val next = ds.partKeys
        .flatMap(_.partValues.collect { case ("batch", v) => v.toLong })
        .maxOption.map(_ + 1).getOrElse(0L)
      new StringCache(spark, root, Some(ds), next)
    }
  }
}
