package graft.lake

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.{PartKey, StorageSpec}
import graft.operators.MaterializedAgg

/** Row-level change feed for a lake table. Every mutation appends stamped
  * batches (`_seq`, `_op`, payload columns) to a LOG that is itself a lake
  * dataset — so the log inherits persistence, manifests, and above all
  * ZONE MAPS on `_seq`: reading "changes since N" prunes to the log cells
  * whose seq interval overlaps (N, ∞) and never rescans history.
  *
  * Ops follow the change-data-feed convention:
  *  - `I`  — inserted rows
  *  - `U-` / `U+` — an upsert's PRE- and POST-image of the matched keys
  *    (captured by a key semi-join before/after the merge; the reference's
  *    null-preserves-old semantics make the post-image a merge product, so
  *    it must be read back, not inferred from the incoming batch). Keys new
  *    to the table appear in `U+` only.
  *  - `D`  — a delete's PRE-image rows (the deleted data; logging keys
  *    alone would lose the information every consumer needs, because the
  *    rows are gone from the table afterwards).
  *
  * Pre/post capture costs one key semi-join per mutation — bounded by the
  * batch's keys, pruned by the same zone/bloom machinery as any keyed
  * probe. At 100 TB the feed is what makes downstream consumers (view
  * maintenance, replication, audits) incremental instead of
  * snapshot-diffing the world.
  */
final class TrackedLake private (
    val table: LakeDataset,
    val log: LakeDataset,
    seq: AtomicLong,
    /** Persist each mutation's log cell as it lands (one-pass
      * [[LakeDataset#insertWritten]] straight to the log root) — the
      * durable-feed mode [[streamChanges]] requires: a crash loses no
      * acknowledged change, and external tailers see cells appear.
      */
    autoPersist: Boolean = false,
    /** `Some((maxCells, keys))` bounds the log's cell count AUTOMATICALLY:
      * when a mutation pushes it past `maxCells`, the log checkpoints at
      * the registered consumers' low-water mark ([[ack]]) — the analogue of
      * the engine's materialize auto-threshold, closing the "long-lived
      * durable feed with a lazy operator accumulates unbounded cells"
      * failure mode. `keys` are the mutation keys the checkpoint
      * reconstructs by. Nothing fires until a consumer has acked (an
      * unconsumed feed must keep its history), and the bound holds as
      * 1 + (mutations past the slowest consumer) — a lagging consumer, not
      * the feed, is then what grows.
      */
    autoCheckpoint: Option[(Int, Seq[String])] = None) {

  private[lake] def seqRef: AtomicLong = seq

  import TrackedLake.{OpCol, SeqCol}

  /** Highest sequence number assigned to a mutation so far. */
  def currentSeq: Long = seq.get()

  private val consumers =
    scala.collection.concurrent.TrieMap[String, Long]()

  /** Record a consumer's progress: it has fully processed every change
    * with `_seq` <= `throughSeq`. The minimum across registered consumers
    * is the [[lowWaterMark]] auto-checkpointing collapses to — acking is
    * how a consumer both reports progress and releases history.
    */
  def ack(consumer: String, throughSeq: Long): Unit =
    consumers.put(consumer, throughSeq)

  /** Lowest acked mark across registered consumers; 0 = none registered
    * (history must be kept — nothing auto-collapses).
    */
  def lowWaterMark: Long =
    if (consumers.isEmpty) 0L else consumers.values.min

  /** Fire the auto-checkpoint when the log's cell count crossed the bound
    * and the consumers' low-water mark would actually collapse something.
    */
  private def maybeAutoCheckpoint(): Unit = autoCheckpoint.foreach {
    case (maxCells, keys) =>
      val lw = lowWaterMark
      if (lw > 0L && log.numParts > maxCells && cellsThrough(lw).size > 1)
        checkpoint(lw, keys)
  }

  private def stamped(df: DataFrame, op: String, n: Long): DataFrame =
    df.withColumn(SeqCol, lit(n)).withColumn(OpCol, lit(op))

  /** Append one mutation's stamped batch to the log: durable one-pass
    * write in autoSave mode, in-memory catalog append otherwise.
    */
  private def logAppend(batch: DataFrame): Unit =
    if (autoPersist) log.insertWritten(batch) else log.insert(batch)

  /** Driver-side copy of the batch's key values when the mutation key is a
    * single BIGINT column and the batch is small enough to hold — the
    * precondition for routing the image scans through
    * [[LakeDataset#prunedByLongKeys]] (zones + blooms + bucket routing skip
    * every cell that provably holds none of the keys). Over the cap, or for
    * composite / non-long keys, `None` = fall back to the full-table
    * semi-join, which a batch that big amortizes anyway (fail open).
    */
  private def probeKeys(
      keyRows: DataFrame, keys: Seq[String]): Option[Array[Long]] =
    keys match {
      case Seq(k) if table.tableSchema(k).dataType ==
          org.apache.spark.sql.types.LongType =>
        val rows = keyRows.limit(TrackedLake.MaxProbeKeys + 1).collect()
        if (rows.length > TrackedLake.MaxProbeKeys) None
        // NULL keys never equality-match in the semi-join, so dropping
        // them from the probe set loses nothing.
        else Some(rows.iterator.filterNot(_.isNullAt(0))
          .map(_.getLong(0)).toArray)
      case _ => None
    }

  /** The table's current rows matching the mutation's keys. `probe`
    * (when available) prunes the scan to the cells that may hold the keys;
    * the semi-join then narrows to the exact rows. No broadcast hint: a
    * small delta broadcasts by Catalyst's own sizing, while a huge one
    * (backfills routinely rewrite whole partitions) must shuffle — a
    * forced broadcast of an unbounded key set is a driver OOM at scale.
    */
  private def keyImage(keyRows: DataFrame, keys: Seq[String],
      probe: Option[Array[Long]]): DataFrame = {
    val base = probe match {
      case Some(ks) => table.prunedByLongKeys(keys.head, ks)
      case None => table.toDF
    }
    base.join(keyRows, keys.toSeq, "left_semi").localCheckpoint(true)
  }

  def insert(df: DataFrame): Long = this.synchronized {
    table.insert(df)
    val n = seq.incrementAndGet()
    logAppend(stamped(df, "I", n))
    maybeAutoCheckpoint()
    n
  }

  def upsert(df: DataFrame, keys: Seq[String]): Long = this.synchronized {
    val keyRows = df.select(keys.map(col): _*).distinct().localCheckpoint(true)
    val probe = probeKeys(keyRows, keys)
    val pre = keyImage(keyRows, keys, probe)
    table.upsert(df, keys)
    val post = keyImage(keyRows, keys, probe)
    val n = seq.incrementAndGet()
    // One append for both images: they share the mutation's cell, and the
    // durable path writes each cell exactly once.
    logAppend(stamped(pre, "U-", n).unionByName(stamped(post, "U+", n)))
    maybeAutoCheckpoint()
    n
  }

  def delete(keysDf: DataFrame, keys: Seq[String]): Long = this.synchronized {
    val keyRows = keysDf.select(keys.map(col): _*).distinct().localCheckpoint(true)
    val pre = keyImage(keyRows, keys, probeKeys(keyRows, keys))
    table.delete(keyRows, keys)
    val n = seq.incrementAndGet()
    logAppend(stamped(pre, "D", n))
    maybeAutoCheckpoint()
    n
  }

  /** Log rows with `_seq` > `sinceSeq`. The log is PARTITIONED by `_seq`
    * (one cell per mutation, so each cell's seq zone is the tight [n, n]) —
    * this read prunes to the tail cells and costs ∝ new changes, not ∝
    * history. ChangeFeedSpec pins the plan leaf count.
    */
  def changesSince(sinceSeq: Long): DataFrame =
    log.prunedByConstraints(Map.empty,
        Map(SeqCol -> (Some(sinceSeq + 1L), None)))
      .filter(col(SeqCol) > sinceSeq)

  /** TIME TRAVEL: reconstruct the table as of sequence `asOfSeq` from the
    * log alone — per key, the LATEST image at or before the mark decides
    * (`I`/`U+` rows are states, `D` means absent, `U-` is evidence, not
    * state). Exact whenever the log covers the table's full history: wrap
    * with `logBase = true` (or start from an empty table) and don't vacuum
    * below the marks you want to visit — the same contract as any
    * CDF-based time travel. One window over the log prefix: this is a
    * reconstruction path (audits, debugging, reproducing a training
    * snapshot), not a serving path.
    *
    * `keys` are the table's mutation keys (what upserts/deletes identify
    * rows by).
    */
  def tableAsOf(asOfSeq: Long, keys: Seq[String]): DataFrame =
    tableAsOfKeys(asOfSeq, keys, None)

  /** [[tableAsOf]] optionally RESTRICTED to the keys in `onlyKeys`: the
    * window dedup then runs over those keys' log rows only — O(restricted
    * keys × their depth), not O(table). [[restore]]'s drift path.
    */
  private def tableAsOfKeys(asOfSeq: Long, keys: Seq[String],
      onlyKeys: Option[DataFrame]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // Prune by the seq UPPER bound: after a checkpoint the log is one base
    // cell + tail, and a reconstruction at a historical mark must plan only
    // the cells at or below it — not one leaf per post-mark mutation
    // (ChangeFeedSpec pins the leaf count like the changesSince one).
    val hist0 = log
      .prunedByConstraints(Map.empty, Map(SeqCol -> (None, Some(asOfSeq))))
      .filter(col(SeqCol) <= asOfSeq && col(OpCol) =!= "U-")
    val hist = onlyKeys.fold(hist0)(k => hist0.join(k, keys.toSeq, "left_semi"))
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(SeqCol).desc)
    hist.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col(OpCol) =!= "D")
      .drop("__rn", SeqCol, OpCol)
  }

  /** SCD TYPE-2 dimension history derived from the log: one row per state
    * INTERVAL of each key — `_valid_from`/`_valid_to` are the feed's seq
    * marks (`_valid_to` NULL = still current). `I`/`U+` images open
    * intervals; the key's next change closes the previous one; a `D`
    * closes without opening (the key has no current row until
    * re-inserted); `U-` pre-images are evidence, not state. Exact under
    * the same contract as [[tableAsOf]] (full-history log: `logBase =
    * true` or empty start; no vacuum below visited marks).
    *
    * Shape: ONE window over the log ordered by seq within key — one
    * shuffle by key, history length per key is mutation count, never
    * corpus size. `historyAsOf(seq)` (the interval filter) reproduces
    * [[tableAsOf]] row-for-row — spec-pinned, and the standard way SCD2
    * serves point-in-time dimension joins without replaying the log.
    */
  def scdHistory(keys: Seq[String]): DataFrame = scdHistory(keys, None)

  /** [[scdHistory]] bounded at `throughSeq`: plans only the log cells at or
    * below the mark (the post-checkpoint base+tail prune), with `_valid_to`
    * intervals as of that mark.
    */
  def scdHistory(keys: Seq[String], throughSeq: Option[Long]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(SeqCol).asc)
    val hist = throughSeq match {
      case Some(t) => log
        .prunedByConstraints(Map.empty, Map(SeqCol -> (None, Some(t))))
        .filter(col(SeqCol) <= t)
      case None => log.toDF
    }
    hist.filter(col(OpCol) =!= "U-")
      .withColumn("_valid_to", lead(col(SeqCol), 1).over(w))
      .filter(col(OpCol) =!= "D")
      .withColumn("_current", col("_valid_to").isNull)
      .withColumnRenamed(SeqCol, "_valid_from")
      .drop(OpCol)
  }

  /** The dimension as of `asOfSeq`, served FROM the interval table —
    * `[[scdHistory]]` filtered to intervals covering the mark. Equivalent
    * to [[tableAsOf]] but reusable: materialize the history once, answer
    * any number of point-in-time joins with a plain filter.
    */
  def historyAsOf(history: DataFrame, asOfSeq: Long): DataFrame =
    history
      .filter(col("_valid_from") <= asOfSeq &&
        (col("_valid_to").isNull || col("_valid_to") > asOfSeq))
      .drop("_valid_from", "_valid_to", "_current")

  /** Roll the TABLE back to its state at `asOfSeq` — as ordinary LOGGED
    * mutations (one delete, one insert), so the feed's history stays
    * linear: consumers see the restore as changes, `DESCRIBE HISTORY`
    * records it, and time travel can visit both sides of it.
    *
    * DRIFT-ONLY: one null-safe key join of current-vs-mark finds exactly
    * the keys whose row differs (including keys added or removed since),
    * and only THOSE delete + reinsert — the logged volume and the engine
    * mutation are O(drift), not O(table). Restoring a 100 TB table to
    * yesterday touches yesterday's changes, not 100 TB. Exact under the
    * same full-history contract as [[tableAsOf]] — delete-then-insert
    * rather than an upsert because engine-upsert's NULL-preserves-old
    * coalesce would silently keep post-mark values in columns that were
    * NULL at the mark (a drifted row restores ALL its mark columns).
    * Columns added to the table since the mark count as drift whenever
    * non-null, and restore nulls them — the mark state is authoritative.
    * Returns the new high-water mark. (Restoring by rewriting the table
    * OUTSIDE the feed would fork the log from the table — the one thing a
    * feed must never allow.)
    */
  def restore(asOfSeq: Long, keys: Seq[String]): Long = this.synchronized {
    // O(drift) end to end: the log TAIL names every key mutated past the
    // mark (the feed logs every mutation — its core contract), so a key
    // absent from the tail is bit-identical on both sides and never enters
    // the diff. The mark-side reconstruction windows over the touched
    // keys' log rows only; the current side is one semi-join of the table
    // (broadcastable when the drift is small); the diff joins two
    // drift-sized sets.
    val touched = changesSince(asOfSeq)
      .select(keys.map(col): _*).distinct().localCheckpoint(true)
    val want = tableAsOfKeys(asOfSeq, keys, Some(touched)).localCheckpoint(true)
    val cur = table.toDF.join(touched, keys.toSeq, "left_semi")
    // Widen both sides to the union schema (a column missing on one side
    // compares as NULL) so schema evolution since the mark diffs soundly.
    val allCols = (cur.columns ++ want.columns).distinct.toSeq
    // Disambiguate by RENAME (not plan alias — the drift checkpoint below
    // flattens the plan, and duplicate names would be unresolvable after).
    def prefixed(d: DataFrame, p: String, tag: String): DataFrame =
      d.select(allCols.map(c =>
        (if (d.columns.contains(c)) col(s"`$c`")
        else lit(null)).as(s"$p$c")): _*).withColumn(tag, lit(true))
    val l = prefixed(cur, "__l_", "__cur")
    val r = prefixed(want, "__r_", "__mark")
    val on = keys.map(k => col(s"`__l_$k`") <=> col(s"`__r_$k`")).reduce(_ && _)
    val differs = allCols.filterNot(keys.contains)
      .map(c => !(col(s"`__l_$c`") <=> col(s"`__r_$c`")))
      .foldLeft(lit(false))(_ || _)
    // ONE materialization of the drift set; both legs slice it.
    val drift = l.join(r, on, "full_outer")
      .withColumn("__del",
        col("__cur").isNotNull && (col("__mark").isNull || differs))
      .withColumn("__ins",
        col("__mark").isNotNull && (col("__cur").isNull || differs))
      .filter(col("__del") || col("__ins"))
      .localCheckpoint(true)
    delete(drift.filter(col("__del"))
      .select(keys.map(k => col(s"`__l_$k`").as(k)): _*), keys)
    insert(drift.filter(col("__ins"))
      .select(want.columns.toSeq.map(c => col(s"`__r_$c`").as(c)): _*))
  }

  /** Per-mutation audit summary from the log — the `DESCRIBE HISTORY`
    * surface: one row per visitable version with its operation kind and
    * affected-row counts (`inserted` = I images, `upserted` = U+
    * post-images incl. new keys, `deleted` = D pre-images), newest first.
    * One aggregation over the log, O(mutations) rows. Versions whose
    * mutation affected zero rows logged no cell and do not appear;
    * checkpointed prefixes appear as their collapsed base INSERT.
    */
  def history: DataFrame =
    log.toDF.groupBy(col(SeqCol).as("version"))
      .agg(
        max(when(col(OpCol) === "I", lit("INSERT"))
          .when(col(OpCol) === "D", lit("DELETE"))
          .otherwise(lit("UPSERT"))).as("operation"),
        count(when(col(OpCol) === "I", 1)).as("inserted"),
        count(when(col(OpCol) === "U+", 1)).as("upserted"),
        count(when(col(OpCol) === "D", 1)).as("deleted"))
      .orderBy(col("version").desc)

  /** Retention: drop whole log cells with `_seq` <= `throughSeq` (every
    * consumer has moved past them). Cell-level DROP PARTITION — no data
    * rewrite, directories delete when the log is persisted. The log
    * otherwise grows one cell per mutation forever. NB vacuuming below a
    * mark makes [[tableAsOf]] at that mark unreconstructable — retention
    * and time travel trade off exactly as in any log-structured design.
    */
  def vacuum(throughSeq: Long): Unit = {
    val old = cellsThrough(throughSeq)
    if (old.nonEmpty) log.dropParts(old)
  }

  private def cellsThrough(throughSeq: Long): List[PartKey] =
    log.partKeys.filter(_.partValues.exists {
      case (c, v) => c == SeqCol && v != null &&
        scala.util.Try(v.toLong).toOption.exists(_ <= throughSeq)
    })

  /** CHECKPOINT the log: collapse every cell with `_seq` <= `atSeq` into
    * ONE base cell — the table AS OF `atSeq` reconstructed from the log
    * itself, stamped (`_seq` = `atSeq`, `_op` = "I"). The log's cell count
    * drops to 1 + (mutations since `atSeq`) while everything a consumer at
    * or past the mark can ask for is unchanged:
    *  - [[tableAsOf]] at any mark >= `atSeq` is exact — the base cell IS
    *    the latest image per key at `atSeq` (deleted keys absent), and
    *    later cells override it in the per-key window;
    *  - [[changesSince]] at any mark >= `atSeq` never sees the base cell
    *    (its tight seq zone [atSeq, atSeq] prunes out);
    *  - a NEW consumer bootstraps with `changesSince(atSeq - 1)`: base
    *    state + tail, the checkpoint-plus-log read every log-structured
    *    format serves.
    * Marks BELOW `atSeq` become unvisitable and mid-prefix consumers
    * would double-count the base cell — the same retention contract as
    * [[vacuum]], with history replaced by its net effect instead of
    * dropped. Exactness needs the log to cover full history up to `atSeq`
    * (`logBase = true` or an empty start). On a persisted log the swap is
    * not atomic across a process kill (drop, then insert + save) — rerun
    * the checkpoint after a crash-restore from the table.
    */
  def checkpoint(atSeq: Long, keys: Seq[String]): Unit = this.synchronized {
    require(atSeq <= seq.get(),
      s"checkpoint($atSeq) is above currentSeq ${seq.get()}")
    val old = cellsThrough(atSeq)
    if (old.isEmpty) return
    // Materialize BEFORE dropping: the reconstruction reads the very
    // cells about to be dropped.
    val base = stamped(tableAsOf(atSeq, keys), "I", atSeq).localCheckpoint(true)
    log.dropParts(old)
    logAppend(base)
    if (!autoPersist && log.storage.isDefined) log.saveParts(cellsThrough(atSeq))
  }

  /** Structured Streaming view of a DURABLE feed (`autoSave`): each
    * mutation lands as a new cell directory under the log root, so
    * Spark's file stream source tails the log — new cells are discovered
    * per micro-batch and delivered exactly once per query. Feed consumers
    * become ordinary streaming queries (windowed aggregates, foreachBatch
    * replication to another system, alerting) with checkpointed progress
    * and no bespoke consumer machinery; `_seq` arrives as a column
    * (parsed from the cell directory), so a consumer can still filter or
    * order by mark. Batch readers keep using [[changesSince]].
    */
  def streamChanges(): DataFrame = {
    require(autoPersist,
      "streamChanges needs a durable feed: TrackedLake(..., logRoot = " +
        "Some(root), autoSave = true) — unsaved mutations would be " +
        "invisible to the file stream")
    val spec = log.storage.getOrElse(throw new IllegalStateException(
      "streamChanges: autoSave feed has no storage root"))
    // Glob the cell dirs (skips manifest.json at the root); basePath makes
    // the source parse `_seq=N` as a partition value of the given schema.
    log.spark.readStream
      .schema(log.tableSchema)
      .option("basePath", spec.root)
      .parquet(s"${spec.root}/${TrackedLake.SeqCol}=*")
  }

  /** Drive a [[MaterializedAgg]] view from the feed alone. Replay rule:
    * groups touched by any U/D change get ONE exact recompute against the
    * CURRENT table (`refreshGroups` — final-state recompute is idempotent
    * and order-free); inserted rows fold incrementally, EXCLUDING rows
    * whose group the refresh already covers (folding them too would double
    * count: the refresh reads the final table, which contains them).
    * Returns the new high-water mark.
    */
  def applyChangesTo(view: MaterializedAgg, fromSeq: Long): Long = {
    val changes = changesSince(fromSeq).localCheckpoint(true)
    val high = changes.agg(max(col(SeqCol))).head()
    if (high.isNullAt(0)) return fromSeq
    val payload = changes.drop(SeqCol)
    val ud = payload.filter(col(OpCol) =!= "I").drop(OpCol)
      .localCheckpoint(true)
    val inserts = payload.filter(col(OpCol) === "I").drop(OpCol)
    if (ud.isEmpty) {
      if (!inserts.isEmpty) view.applyInsert(inserts)
    } else {
      val touched = ud.select(view.groupColumns.map(col): _*).distinct()
      val cond = view.groupColumns.map(c => inserts(c) <=> touched(c))
        .reduce(_ && _)
      val freshInserts = inserts.join(broadcast(touched), cond, "left_anti")
      if (!freshInserts.isEmpty) view.applyInsert(freshInserts)
      view.refreshGroups(table.toDF, ud)
    }
    high.getLong(0)
  }
}

object TrackedLake {
  val SeqCol = "_seq"
  val OpCol = "_op"

  /** Largest key batch collected to the driver for the pruned image probe
    * (8 B/key → ≤ ~800 KB driver-side). Bigger mutations fall back to the
    * full-table semi-join they amortize anyway — same stance as the
    * incremental exact index's capped probe.
    */
  val MaxProbeKeys = 100000

  /** Wrap a dataset with a change feed. The log is partitioned by `_seq`
    * — one cell per mutation with a tight seq zone, so tail reads prune to
    * exactly the unconsumed cells (an op-partitioned layout was rejected:
    * each op's single cell would widen its seq zone over ALL history and
    * nothing would ever prune). Give `logRoot` to persist the log like any
    * lake dataset — a reopened feed continues numbering after the highest
    * persisted seq.
    */
  /** `logBase = true` logs the table's CURRENT contents as the first `I`
    * batch, so the log covers full history and [[TrackedLake#tableAsOf]]
    * is exact from seq 0 — the one-time cost is one pass over the table
    * (the same initial-commit cost every log-structured format pays).
    */
  def apply(spark: SparkSession, table: LakeDataset,
      logRoot: Option[String] = None, logBase: Boolean = false,
      autoSave: Boolean = false,
      autoCheckpoint: Option[(Int, Seq[String])] = None): TrackedLake = {
    require(!table.tableSchema.fieldNames.contains(SeqCol) &&
      !table.tableSchema.fieldNames.contains(OpCol),
      s"table already has a $SeqCol/$OpCol column")
    require(!autoSave || logRoot.isDefined,
      "autoSave needs a logRoot to persist into")
    val log = logRoot match {
      case Some(root) if java.nio.file.Files.exists(
          java.nio.file.Paths.get(root, graft.model.Manifest.FileName)) =>
        LakeDataset.fromStorage(spark, root)
      case _ =>
        val schema = org.apache.spark.sql.types.StructType(
          table.tableSchema.fields.toSeq :+
            org.apache.spark.sql.types.StructField(SeqCol,
              org.apache.spark.sql.types.LongType, nullable = false) :+
            org.apache.spark.sql.types.StructField(OpCol,
              org.apache.spark.sql.types.StringType, nullable = false))
        val empty = spark.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
        LakeDataset.fromDataFrame(spark, empty,
          partitionCols = Seq(SeqCol),
          storage = logRoot.map(StorageSpec(_)))
    }
    val high =
      if (log.numParts == 0) 0L
      else log.toDF.agg(max(col(SeqCol))).head() match {
        case r if r.isNullAt(0) => 0L
        case r => r.getLong(0)
      }
    val t = new TrackedLake(table, log, new AtomicLong(high), autoSave,
      autoCheckpoint)
    if (logBase && high == 0L && table.numParts > 0) {
      val n = t.seqRef.incrementAndGet()
      val base = table.toDF
        .withColumn(SeqCol, lit(n)).withColumn(OpCol, lit("I"))
      if (autoSave) log.insertWritten(base) else log.insert(base)
    }
    t
  }
}
