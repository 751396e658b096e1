package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.lake.{Database, LakeDataset}

/** Structured-Streaming front-end for the lake.
  *
  * The reference's "streaming" is chunked ingest over gRPC/TCP (reference:
  * src/server.rs:48-88) — its Spark-idiomatic upgrade is a streaming query
  * whose `foreachBatch` applies each micro-batch through the SAME
  * insert/upsert path the batch API uses (SURVEY.md §3.2). Use:
  *
  * {{{
  * stream.writeStream
  *   .foreachBatch(StreamingIngest.upsertBatches(ds, keys, Some(db -> "t")))
  *   .start()
  * }}}
  *
  * Unlike the reference (whose upsert stream final-flushes with insert —
  * src/server.rs:81-87), every batch here applies the declared operation.
  */
object StreamingIngest {

  /** foreachBatch sink: upsert each micro-batch, then refresh the SQL view. */
  def upsertBatches(
      ds: LakeDataset, keys: Seq[String],
      refresh: Option[(Database, String)] = None): (DataFrame, Long) => Unit =
    (batch, _) => {
      ds.upsert(batch, keys)
      refresh.foreach { case (db, name) => db.refresh(name) }
    }

  /** Epoch partition column of [[exactlyOnceInsert]] lakes. */
  val EpochCol = "_epoch"

  /** EXACTLY-ONCE streaming append. [[insertBatches]] is at-least-once: a
    * crash between the sink call and the checkpoint commit makes Spark
    * re-deliver the epoch, duplicating the batch. Here the lake is
    * PARTITIONED by the epoch id, so each micro-batch is one fresh cell
    * directory whose presence is the commit record — and on a re-delivered
    * epoch the sink OVERWRITES the epoch's cells instead of skipping them
    * (a replayed epoch's cell may be a torn partial from a crash
    * mid-write; skip-if-present would freeze the tear, overwrite is always
    * safe). Epoch overwrite + Spark's replay-from-last-commit = every
    * batch lands exactly once, with no transaction log beyond the layout.
    *
    * Requirements: `EpochCol` must be a partition column and (with other
    * partition columns present) sort first — the wipe removes the epoch's
    * whole directory subtree, catalog-known or torn alike.
    */
  def exactlyOnceInsert(ds: LakeDataset): (DataFrame, Long) => Unit = {
    require(ds.partitionCols.contains(EpochCol),
      s"exactlyOnceInsert needs $EpochCol as a partition column")
    require(ds.partitionCols.sorted.head == EpochCol,
      s"$EpochCol must sort first among partition columns (directory layout)")
    (batch, epoch) => {
      val stale = ds.partKeys.filter(_.partValues.exists {
        case (k, v) => k == EpochCol && v == epoch.toString
      })
      if (stale.nonEmpty) ds.dropParts(stale)
      ds.storage.foreach { spec =>
        val d = java.nio.file.Paths.get(spec.root, s"$EpochCol=$epoch")
        if (java.nio.file.Files.exists(d)) LakeDataset.deleteRecursively(d)
      }
      ds.insertWritten(batch.withColumn(EpochCol, lit(epoch)))
    }
  }

  /** foreachBatch sink: append each micro-batch. */
  def insertBatches(
      ds: LakeDataset,
      refresh: Option[(Database, String)] = None): (DataFrame, Long) => Unit =
    (batch, _) => {
      ds.insert(batch)
      refresh.foreach { case (db, name) => db.refresh(name) }
    }

  /** foreachBatch sink maintaining the base lake AND an incremental
    * aggregate view ([[graft.operators.MaterializedAgg]]) in the same
    * micro-batch: the view folds the batch's group partials into its
    * |groups|-sized state, so a streaming dashboard aggregate stays current
    * at per-batch cost — the base table is never rescanned.
    */
  def insertWithView(
      ds: LakeDataset, view: graft.operators.MaterializedAgg,
      refresh: Option[(Database, String)] = None): (DataFrame, Long) => Unit =
    (batch, _) => {
      ds.insert(batch)
      view.applyInsert(batch)
      refresh.foreach { case (db, name) => db.refresh(name) }
    }

  /** foreachBatch sink with a DATA CONTRACT at the table boundary
    * ([[graft.operators.DataQuality.insertValidated]]): each micro-batch's
    * clean rows insert into the table, violating rows (tagged with the
    * constraints they broke) land in the QUARANTINE lake — on a stream,
    * bad rows neither stall the pipeline nor poison the table, and the
    * quarantine is itself a queryable lake (triage with the same SQL
    * surface). Per-batch cost is the ordinary validated insert; both
    * lakes grow by disjoint row sets that reconstruct the input.
    */
  def validatedBatches(
      ds: LakeDataset, quarantine: LakeDataset,
      constraints: Seq[graft.operators.DataQuality.Constraint])
      : (DataFrame, Long) => Unit =
    (batch, _) => {
      if (!batch.isEmpty) {
        val rejected = graft.operators.DataQuality
          .insertValidated(ds, batch, constraints)
          .withColumn("violations",
            concat_ws(",", col("__violations"))).drop("__violations")
        if (!rejected.isEmpty) quarantine.insert(rejected)
      }
    }

  /** Drift-gated ingest — the promote-or-hold admission gate as a
    * streaming sink, the DISTRIBUTION-level sibling of [[validatedBatches]]
    * (constraints ask "is each row well-formed?"; this asks "does the
    * batch still look like the corpus?"). Each micro-batch's value
    * histogram is compared against the CURRENT table snapshot via
    * `DataQuality.histogramDrift` (exact integer TVD numerators); a batch
    * whose total-variation distance exceeds `maxDevPerMille`/1000 is
    * QUARANTINED whole into the side dataset for review — a re-crawl that
    * suddenly returns truncated pages must not silently shift the corpus —
    * while conforming batches insert normally. The comparison stays in
    * exact integers (`Σdev·1000 > maxDevPerMille·2·N_table·N_batch`), so
    * the admit/hold decision is bit-reproducible by any engine. Both sides
    * are evaluated in BigInt on the driver (the inputs are three
    * already-aggregated scalars, so the cost is nil): Σdev itself can
    * reach 2·N_t·N_b when the histograms are disjoint, and a Long product
    * would silently wrap — flipping admit/quarantine — once N_t·N_b
    * passes ~4.6e15, i.e. exactly the 100 TB-scale tables this gate
    * guards.
    * Cost per batch: one narrow scan of each side + a bin-keyed merge of
    * two nBins-row frames. An EMPTY table admits its first batch — the
    * bootstrap batch defines the distribution rather than drifting from a
    * nonexistent one.
    */
  def driftGatedBatches(
      ds: LakeDataset, quarantine: LakeDataset, valueCol: String,
      binWidth: Long, nBins: Int, maxDevPerMille: Long): (DataFrame, Long) => Unit = {
    require(maxDevPerMille > 0 && maxDevPerMille < 1000,
      s"maxDevPerMille must be in (0, 1000): $maxDevPerMille")
    (batch, _) => {
      if (!batch.isEmpty) {
        val b = batch.localCheckpoint(true)
        val r = graft.operators.DataQuality
          .histogramDrift(ds.toDF, b, col(valueCol), binWidth, nBins)
          .agg(sum("dev"), sum("n_before"), sum("n_after")).head()
        // dev is Decimal(38,0) (per-bin numerators overflow a long once
        // the table×batch row product passes ~9.2e18); the whole decision
        // stays in exact big-integer arithmetic.
        val sumDev = BigInt(r.getDecimal(0).toBigInteger)
        val nTable = r.getLong(1)
        val nBatch = r.getLong(2)
        val drifted = sumDev * 1000 >
          BigInt(maxDevPerMille) * 2 * BigInt(nTable) * BigInt(nBatch)
        if (drifted) quarantine.insert(b) else ds.insert(b)
      }
    }
  }

  /** foreachBatch sink APPLYING a change feed
    * ([[graft.lake.TrackedLake#streamChanges]]) to a REPLICA lake — CDC
    * replication from feed + streaming + merge, no bespoke machinery.
    * Mutations apply in ascending `_seq` (a delete must not land before
    * the insert it follows); per mutation, insert images and upsert
    * POST-images merge by `keys`, delete pre-images anti-join out by
    * `keys`, and `U-` evidence rows are skipped. Inserts apply as merges
    * deliberately: every step is then idempotent, so the file stream's
    * at-least-once delivery (a batch can replay after a crash) still
    * yields an exactly-once replica. Requires `keys` unique in the source
    * table — the same contract its upserts/deletes already assume.
    */
  def applyFeedBatches(
      replica: LakeDataset, keys: Seq[String]): (DataFrame, Long) => Unit =
    (batch, _) => {
      import graft.lake.TrackedLake.{OpCol, SeqCol}
      if (!batch.isEmpty) {
        // One materialization; each per-mutation filter below re-slices it
        // instead of re-reading the batch's files.
        val b = batch.localCheckpoint(true)
        // One pass discovers every (mutation, op) present — the loop below
        // then runs only the applies that exist, with no per-seq probing.
        val present = b.select(SeqCol, OpCol).distinct().collect()
          .map(r => (r.getLong(0), r.getString(1)))
        val opsBySeq = present.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
        present.map(_._1).distinct.sorted.foreach { n =>
          val m = b.filter(col(SeqCol) === n)
          val ops = opsBySeq(n)
          if (ops.contains("I"))
            replica.upsert(m.filter(col(OpCol) === "I").drop(SeqCol, OpCol), keys)
          if (ops.contains("U+"))
            replica.upsert(m.filter(col(OpCol) === "U+").drop(SeqCol, OpCol), keys)
          if (ops.contains("D"))
            replica.delete(m.filter(col(OpCol) === "D")
              .select(keys.map(col): _*), keys)
        }
      }
    }

  /** foreachBatch sink maintaining an incremental MinHash near-dup index
    * ([[graft.operators.MinhashIndex]]): each micro-batch of documents signs
    * only its own rows, band-joins against the whole persisted corpus, and
    * hands the VERIFIED new near-dup pairs to `onPairs` (alerting, a pairs
    * lake, a quarantine queue). This is continuous dedup of a document
    * stream with per-batch cost ∝ batch — the full-recompute operator can
    * never sit on an ingest path.
    */
  def dedupBatches(
      index: graft.operators.MinhashIndex,
      textCol: String, idCol: String, threshold: Double = 0.7,
      onPairs: DataFrame => Unit = _ => ()): (DataFrame, Long) => Unit =
    (batch, _) => {
      if (!batch.isEmpty)
        onPairs(index.addBatch(batch, textCol, idCol, threshold))
    }

  /** foreachBatch sink maintaining an incremental EXACT dedup index
    * ([[graft.operators.ExactDedupIndex]]): each micro-batch anti-joins its
    * fingerprints against the whole persisted corpus and hands the batch's
    * NEW-unique documents to `onFresh` (write a training shard, feed a
    * downstream queue) — continuous "has the corpus ever seen this
    * content?" filtering at per-batch cost. `onFresh` must CONSUME its
    * frame inside the call (collect or write): with `compactEvery` > 0 the
    * sink folds the accumulated batch partitions every that-many ingests
    * (see [[graft.operators.ExactDedupIndex.compact]]), which invalidates
    * earlier batches' result frames while keeping the cell count the
    * per-probe driver prune walks O(nBuckets) on an unbounded stream.
    */
  def exactDedupBatches(
      index: graft.operators.ExactDedupIndex,
      textCol: String, idCol: String,
      compactEvery: Int = 0,
      onFresh: DataFrame => Unit = _ => ()): (DataFrame, Long) => Unit =
    (batch, _) => {
      if (!batch.isEmpty) {
        onFresh(index.addBatch(batch, textCol, idCol))
        if (compactEvery > 0 && index.batches % compactEvery == 0)
          index.compact()
      }
    }

  /** foreachBatch sink maintaining a persisted IVF ANN index
    * ([[graft.operators.Similarity.IvfLake]]): each micro-batch routes to
    * its nearest centroids and appends to the matching inverted lists (cost
    * ∝ batch, only touched list directories save). When a drifting stream
    * skews the lists past `maxSkew`, the sink SELF-HEALS: the bounded
    * incremental recluster splits only the overflowing lists and the next
    * micro-batch routes against the healed centroids — monitor fires, index
    * heals, monitor stands down, no operator intervention. `current` always
    * holds the live handle (probe-able mid-stream); `onHeal` observes heals.
    */
  def ivfBatches(
      root: String, initial: graft.operators.Similarity.IvfLake,
      vecCol: String, idCol: String,
      maxSkew: Double = 4.0, splitInto: Int = 4,
      onHeal: graft.operators.Similarity.IvfLake => Unit = _ => ())
      : ((DataFrame, Long) => Unit, () => graft.operators.Similarity.IvfLake) = {
    val cur = new java.util.concurrent.atomic.AtomicReference(initial)
    val sink: (DataFrame, Long) => Unit = (batch, _) =>
      if (!batch.isEmpty)
        cur.set(graft.operators.Similarity.addToIvfMaintained(
          root, cur.get, batch, vecCol, idCol, maxSkew, splitInto, onHeal))
    (sink, () => cur.get)
  }

  /** foreachBatch sink maintaining a persisted BM25 inverted index
    * ([[graft.operators.TextSearch]]): each micro-batch's postings append
    * as a fresh batch partition routed into the existing term-bucket cells
    * (cost ∝ batch — existing cells never rewrite), and the corpus scalars
    * update from one batch-sized aggregate, so searches are correct the
    * moment a batch lands: continuous index freshness under ingest, no
    * rebuild jobs. This completes the set — every persisted index family in
    * the engine (exact dedup, MinHash, IVF, BM25) now has a streaming
    * maintenance sink. Contract: ids must be NEW to the index (route the
    * stream through [[exactDedupBatches]] first; re-adding double-counts,
    * as with any append-only search index). On an unbounded stream fold the
    * accumulated batch partitions periodically via
    * `index.postings.materialize()` — same discipline as the dedup
    * indexes' `compact()`.
    */
  def bm25Batches(
      initial: graft.operators.TextSearch.Bm25Index,
      textCol: String, idCol: String)
      : ((DataFrame, Long) => Unit, () => graft.operators.TextSearch.Bm25Index) = {
    val cur = new java.util.concurrent.atomic.AtomicReference(initial)
    val sink: (DataFrame, Long) => Unit = (batch, _) =>
      if (!batch.isEmpty)
        cur.set(graft.operators.TextSearch.addToIndex(
          cur.get, batch, textCol, idCol))
    (sink, () => cur.get)
  }

  /** foreachBatch sink routing a STREAM of erase requests through every
    * persisted surface at once — the right-to-be-forgotten composition
    * ([[graft.SparkEntry]]'s `pipeline_erasure_full`) as it arrives in a
    * real GDPR pipeline: deletion requests trickle in continuously, and
    * each micro-batch of ids must disappear from the corpus table AND all
    * five index families (exact-dedup, MinHash bands+shingles, BM25
    * postings, positional postings, IVF inverted lists) before the batch
    * is acknowledged. Per batch, every remove is touched-cell-bounded —
    * each index's own erase path locates the doomed cells by its pruning
    * probe and rewrites only those — so the sink's cost is ∝ batch and the
    * cells it hits, never the corpus.
    *
    * State: the BM25 handle carries corpus scalars (n, totalLen), so the
    * sink threads it through an AtomicReference exactly like
    * [[bm25Batches]]; the IVF handle is reloaded from its root per batch
    * (removeFromIvf rewrites list directories on disk, staling any held
    * handle). All other surfaces are self-rooted and mutate in place.
    * Idempotent per id (every surface's remove is a delete-by-key), so the
    * file stream's at-least-once replay of an erase batch is harmless —
    * the same property [[applyFeedBatches]] leans on.
    *
    * `vecIds` maps a batch of document ids to the vector ids to drop from
    * the IVF index (identity by default — shared id space).
    */
  def erasureBatches(
      corpus: LakeDataset, corpusKey: String,
      exact: graft.operators.ExactDedupIndex,
      minhash: graft.operators.MinhashIndex,
      bm25Initial: graft.operators.TextSearch.Bm25Index,
      positional: graft.operators.TextSearch.PositionalIndex,
      ivfRoot: String, vecCol: String = "vec_id")
      : ((DataFrame, Long) => Unit, () => graft.operators.TextSearch.Bm25Index) = {
    val bm = new java.util.concurrent.atomic.AtomicReference(bm25Initial)
    // The IVF handle loads ONCE and is reused across batches: remove only
    // rewrites inverted-list cells (saveParts persists them per batch), it
    // never moves a centroid — so re-collecting the centroid table and
    // re-registering the assigned lake per micro-batch was pure fixed cost
    // per batch, O(batches) manifest reads on an unbounded erase stream.
    val ivf = new java.util.concurrent.atomic.AtomicReference[
      graft.operators.Similarity.IvfLake](null)
    val sink: (DataFrame, Long) => Unit = (batch, _) =>
      if (!batch.isEmpty) {
        // seven consumers; one materialization of the (small) id batch
        val ids = batch.select(col(batch.columns.head).as(corpusKey))
          .localCheckpoint(true)
        val touched = corpus.delete(ids, Seq(corpusKey))
        if (touched.nonEmpty && corpus.storage.isDefined)
          corpus.saveParts(touched)
        exact.remove(ids, corpusKey)
        minhash.remove(ids, corpusKey)
        bm.set(graft.operators.TextSearch.removeFromIndex(
          bm.get, ids, corpusKey))
        graft.operators.TextSearch.removeFromPositional(
          positional, ids, corpusKey)
        if (ivf.get == null)
          ivf.set(graft.operators.Similarity.loadIvf(batch.sparkSession, ivfRoot))
        graft.operators.Similarity.removeFromIvf(
          ivf.get, ids.select(col(corpusKey).as(vecCol)), vecCol)
      }
    (sink, () => bm.get)
  }

  /** Native BOUNDED-STATE streaming dedup: Spark's
    * `dropDuplicatesWithinWatermark` behind the engine's event-time
    * contract — duplicates of a key arriving within the watermark horizon
    * are dropped, and state for keys older than the watermark is EVICTED,
    * so an unbounded stream holds O(keys-per-horizon) state instead of
    * O(all keys ever). This is the complement of the INDEX-backed dedup
    * sinks above ([[exactDedupBatches]] / [[dedupBatches]]): those answer
    * "has the corpus EVER seen this content" at per-batch cost against a
    * persisted lake index; this answers "did this key arrive twice within
    * the delivery-jitter window" — the at-least-once-transport dedup a
    * feed applies BEFORE content-level dedup, with no index to maintain.
    */
  def dedupWithinWatermark(stream: DataFrame, keyCols: Seq[String],
      tsCol: String, watermark: String = "10 minutes"): DataFrame =
    stream.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)

  /** Watermarked stream-stream INNER interval join — the impression→click
    * shape: a left row (key, tsL) matches right rows (key', tsR) with
    * key = key' and tsR in [tsL, tsL + upper]. Both sides watermark, and
    * the time-range predicate is exactly the shape Structured Streaming's
    * planner mines for state eviction bounds: left rows evict once the
    * right watermark passes tsL + upper, right rows once the left
    * watermark passes tsR — state is O(keys per horizon), never O(stream).
    * Inner matches emit as soon as both sides arrive (append mode, no
    * watermark wait). Column names must be disjoint across the two sides.
    */
  def intervalJoin(
      left: DataFrame, right: DataFrame,
      keyLeft: String, keyRight: String,
      tsLeft: String, tsRight: String,
      upper: String = "5 minutes", watermark: String = "10 minutes",
      joinType: String = "inner"): DataFrame =
    left.withWatermark(tsLeft, watermark)
      .join(right.withWatermark(tsRight, watermark),
        col(keyLeft) === col(keyRight) &&
          col(tsRight) >= col(tsLeft) &&
          col(tsRight) <= col(tsLeft) + expr(s"interval $upper"),
        // leftOuter: an unmatched left row null-extends ONLY once the right
        // watermark proves no in-window match can still arrive — the emit
        // is delayed by the horizon, the state bound is the same.
        joinType)

  /** Watermarked tumbling-window aggregation — the stream-relational
    * operator set the reference lacks entirely (SURVEY.md §2.B last row),
    * provided as the engine's native stream-analytics path. Works on both
    * streaming and batch DataFrames.
    */
  def windowedAgg(
      events: DataFrame, tsCol: String, valueCol: String, keyCol: String,
      windowLen: String = "5 minutes", watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen), col(keyCol))
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("total"))

  /** One event on the stateful-sessionization path. */
  final case class SessionEvent(user_id: Long, ts_us: Long)

  /** Per-user session state carried across micro-batches. */
  final case class SessionState(lastTsUs: Long, sessions: Long, events: Long)

  /** Running per-user session stats. */
  final case class SessionUpdate(user_id: Long, sessions: Long, events: Long)

  /** A finished session emitted by [[closedSessions]]. */
  final case class ClosedSession(user_id: Long, start_us: Long, end_us: Long, n_events: Long)

  /** In-flight session state (public: Catalyst encoders cannot generate
    * code against private classes).
    */
  final case class OpenSession(startUs: Long, lastUs: Long, n: Long)

  /** Append-mode stateful sessionization via `flatMapGroupsWithState`: emits
    * a session as soon as a later event proves it closed (gap exceeded);
    * the still-open session rides in state across micro-batches.
    */
  def closedSessions(events: Dataset[SessionEvent], gapMinutes: Long)
      : Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user, batch, state: GroupState[OpenSession]) =>
          val sorted = batch.toSeq.sortBy(_.ts_us)
          val closed = scala.collection.mutable.ListBuffer[ClosedSession]()
          var open = state.getOption
          sorted.foreach { e =>
            open match {
              case Some(o) if e.ts_us - o.lastUs <= gapUs =>
                open = Some(o.copy(lastUs = e.ts_us, n = o.n + 1))
              case Some(o) =>
                closed += ClosedSession(user, o.startUs, o.lastUs, o.n)
                open = Some(OpenSession(e.ts_us, e.ts_us, 1L))
              case None =>
                open = Some(OpenSession(e.ts_us, e.ts_us, 1L))
            }
          }
          open.foreach(state.update)
          closed.iterator
      }
  }

  /** [[SessionEvent]] plus its event-time column (the watermark rides on a
    * real timestamp column; Catalyst encoders need the case class public).
    */
  final case class SessionEventT(user_id: Long, ts_us: Long,
      event_time: java.sql.Timestamp)

  /** [[closedSessions]] with BOUNDED state: an event-time watermark plus
    * `EventTimeTimeout` evicts sessions that can no longer be extended.
    *
    * The NoTimeout variant keeps one state entry per user forever — at
    * 100 TB / billions of users that state store grows without bound and
    * checkpointing it dominates the micro-batch. Here every open session
    * arms a timeout at `lastUs + gap`; once the watermark passes it, no
    * non-late event can extend the session, so it is emitted closed and its
    * state REMOVED. State size becomes O(users active within the watermark
    * horizon), independent of stream lifetime.
    */
  def closedSessionsBounded(
      events: Dataset[SessionEvent], gapMinutes: Long,
      watermarkDelay: String = "1 hour"): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    val wm = events
      .withColumn("event_time", expr("timestamp_micros(ts_us)"))
      .withWatermark("event_time", watermarkDelay)
      .as[SessionEventT]
    wm.groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user, batch, state: GroupState[OpenSession]) =>
          val closed = scala.collection.mutable.ListBuffer[ClosedSession]()
          if (state.hasTimedOut) {
            // Watermark passed lastUs + gap: the session is provably closed.
            state.getOption.foreach(o =>
              closed += ClosedSession(user, o.startUs, o.lastUs, o.n))
            state.remove()
          } else {
            val sorted = batch.toSeq.sortBy(_.ts_us)
            var open = state.getOption
            sorted.foreach { e =>
              open match {
                case Some(o) if e.ts_us - o.lastUs <= gapUs =>
                  open = Some(o.copy(lastUs = e.ts_us, n = o.n + 1))
                case Some(o) =>
                  closed += ClosedSession(user, o.startUs, o.lastUs, o.n)
                  open = Some(OpenSession(e.ts_us, e.ts_us, 1L))
                case None =>
                  open = Some(OpenSession(e.ts_us, e.ts_us, 1L))
              }
            }
            open.foreach { o =>
              state.update(o)
              // Arm eviction for when the watermark proves the session dead;
              // the timestamp must sit above the current watermark.
              val deadlineMs = (o.lastUs + gapUs) / 1000L
              state.setTimeoutTimestamp(
                math.max(deadlineMs, state.getCurrentWatermarkMs() + 1L))
            }
          }
          closed.iterator
      }
  }

  /** Custom stateful stream processing via `mapGroupsWithState` (SURVEY.md
    * §2.B streaming row — absent from the reference entirely): per-user
    * session counting where a gap above `gapMinutes` starts a new session.
    * State (last event time, running counts) persists across micro-batches.
    * Use with OutputMode.Update; also runs on batch Datasets for tests.
    */
  def sessionize(events: Dataset[SessionEvent], gapMinutes: Long)
      : Dataset[SessionUpdate] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    events.groupByKey(_.user_id)
      .mapGroupsWithState[SessionState, SessionUpdate](GroupStateTimeout.NoTimeout) {
        (user, batch, state: GroupState[SessionState]) =>
          val sorted = batch.toSeq.sortBy(_.ts_us)
          var st = state.getOption.getOrElse(SessionState(Long.MinValue, 0L, 0L))
          sorted.foreach { e =>
            val newSession = st.lastTsUs == Long.MinValue || e.ts_us - st.lastTsUs > gapUs
            st = SessionState(e.ts_us,
              st.sessions + (if (newSession) 1 else 0), st.events + 1)
          }
          state.update(st)
          SessionUpdate(user, st.sessions, st.events)
      }
  }

  /** One observation on the streaming-anomaly path. */
  final case class SeriesPoint(key: Long, ts_us: Long, v: Long)

  /** Per-key trailing-window state: the last event time (order guard) and
    * the last ≤ N observed values, oldest first. */
  final case class AnomalyRing(lastTsUs: Long, ring: Seq[Long])

  /** One flagged observation: `anomaly` is None when the key had fewer
    * than N prior observations (don't-know, never "normal"). */
  final case class AnomalyFlag(key: Long, ts_us: Long, v: Long,
    anomaly: Option[Boolean])

  /** Streaming rolling anomaly flags — the stream twin of
    * [[graft.operators.TimeSeries.anomalies]], same integer predicate
    * `kd²·(N·x−S1)² > kn²·(N·S2−S1²)` over each key's last `window`
    * observations, evaluated in BigInt inside the state function (window
    * values are a handful of longs; no float variance, so the streamed
    * flags hash-match the batch operator and its HUGEINT oracle exactly).
    *
    * State per key is the ring of the last ≤ N values plus one timestamp —
    * O(keys·N), independent of stream length. The trailing-window
    * semantics REQUIRE per-key event-time-monotone arrival across batches
    * (the same contract the incremental-index sinks state for replay):
    * an out-of-order event would need history this state no longer holds,
    * so it REFUSES loudly instead of emitting a silently wrong flag.
    * Within a batch, events sort by event time first. Append mode; also
    * runs on batch Datasets for tests.
    */
  def anomalyFlags(
      points: Dataset[SeriesPoint], window: Int,
      kNum: Int = 3, kDen: Int = 1): Dataset[AnomalyFlag] = {
    require(window >= 2, s"window must be >= 2: $window")
    require(kNum > 0 && kDen > 0, s"need k = kNum/kDen > 0: $kNum/$kDen")
    import points.sparkSession.implicits._
    points.groupByKey(_.key)
      .flatMapGroupsWithState[AnomalyRing, AnomalyFlag](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key, batch, state: GroupState[AnomalyRing]) =>
          val sorted = batch.toSeq.sortBy(_.ts_us)
          var st = state.getOption.getOrElse(AnomalyRing(Long.MinValue, Vector.empty))
          val out = sorted.map { p =>
            if (p.ts_us <= st.lastTsUs) throw new IllegalStateException(
              s"anomalyFlags: out-of-order event for key $key at ts ${p.ts_us}" +
                s" (state already at ${st.lastTsUs}) — trailing-window flags " +
                "need per-key event-time-monotone batches")
            val flag =
              if (st.ring.size < window) None
              else {
                val n = BigInt(window)
                val s1 = st.ring.iterator.map(BigInt(_)).sum
                val s2 = st.ring.iterator.map(x => BigInt(x) * BigInt(x)).sum
                val d = n * BigInt(p.v) - s1
                Some(BigInt(kDen) * kDen * d * d >
                  BigInt(kNum) * kNum * (n * s2 - s1 * s1))
              }
            st = AnomalyRing(p.ts_us, (st.ring :+ p.v).takeRight(window))
            AnomalyFlag(key, p.ts_us, p.v, flag)
          }
          state.update(st)
          out.iterator
      }
  }

  /** Gap-based SESSION windows — the stream-relational sessionization verb
    * (Spark's native `session_window`, planned as the merging-session state
    * store): events of one key whose gaps stay under `gap` merge into one
    * session row `(sess_start, key, n, total_value)`; a gap ≥ `gap` starts
    * a new session. In APPEND mode a session emits only once the watermark
    * proves no event can still extend it (watermark > session end), so the
    * output is exactly the batch sessionization of the final event set —
    * the `stream_session_window` gate hash-matches a DuckDB lag/cumsum
    * oracle on it.
    *
    * The value sum accumulates in DECIMAL(38,4) and casts back to double,
    * the engine-wide discipline that keeps float aggregates bit-equal to
    * the oracle. State is O(open sessions per watermark horizon) — closed
    * sessions evict with their emission, the same bound as every windowed
    * aggregate here.
    */
  def sessionWindows(
      events: DataFrame, tsCol: String, keyCol: String, valueCol: String,
      gap: String, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap), col(keyCol))
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol).cast(org.apache.spark.sql.types.DecimalType(38, 4)))
          .as("__dec"))
      .select(col("session_window.start").as("sess_start"), col(keyCol),
        col("n"), col("__dec").cast("double").as("total_value"))
}
