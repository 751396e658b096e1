package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incrementally-maintained equi-JOIN view: the materialized result of
  * `A ⋈ B` on shared key columns, updated from each side's mutation DELTA
  * alone — neither base table is rescanned after the initial build. The
  * join complement to [[MaterializedAgg]] (which maintains GROup-BY state):
  * together they cover the two view shapes a warehouse dashboard or a
  * training-data enrichment pipeline actually materializes (facts joined to
  * dimensions, then aggregated).
  *
  * Maintenance is UNIFORM over insert / update / delete / join-key change:
  * the caller hands the set of primary keys the mutation touched on one
  * side, and the view (1) anti-joins those keys out of the state — stale
  * output rows for updated, deleted, and re-keyed source rows all vanish in
  * this one step — then (2) re-derives exactly the touched rows' join
  * output by semi-joining the POST-mutation side down to the touched keys
  * and joining that delta against the CURRENT other side. A join-key
  * change needs no special case: the old output row dies by primary key,
  * the new one is born under the new key. Correctness needs only that
  * `touchedPk` covers every inserted/updated/deleted row's key (extra keys
  * cost a no-op recompute, never wrongness; if a mutation rewrites the
  * primary key itself, pass both the old and new keys).
  *
  * The 100 TB shape: per-mutation cost is O(|touched| + touched fanout) on
  * the mutated side — the anti/semi joins broadcast the touched-key set
  * when it COUNTS under `spark.graft.mv.broadcastKeyCap` (counted on the
  * already-checkpointed key set, never assumed; over the cap they fail
  * open to AQE shuffle joins). The one full-table term is the re-join of
  * the (small) delta against the other side: Spark broadcasts the delta so
  * the other side streams map-side with no shuffle, and when that side is
  * a lake table bucketed on the join key the caller should pass its
  * bucket-pruned view so the scan touches only the delta's buckets. The
  * state plan is checkpointed every few merges so a long-lived view never
  * accumulates an unbounded lineage.
  *
  * Semantics: INNER equi-join, SQL NULL rules — a NULL join key on either
  * side never matches and so never appears in the view (the oracle's
  * `JOIN ... USING` agrees). The primary-key anti/semi joins use null-SAFE
  * equality, so even a null pk component routes deterministically.
  */
final class MaterializedJoin private (
    joinKeys: Seq[String],
    pkA: Seq[String],
    pkB: Seq[String],
    outCols: Seq[String],
    private var state0: DataFrame,
    private var merges: Int) {

  /** Current view contents: `joinKeys ++ (A \ keys) ++ (B \ keys)`. */
  def state: DataFrame = state0

  /** Fold a mutation of side A into the view. `postMutationA` is A's full
    * contents AFTER the mutation; `touchedPkA` needs only the pkA columns
    * of the touched rows; `currentB` is B's contents as of now.
    */
  def refreshA(postMutationA: DataFrame, touchedPkA: DataFrame, currentB: DataFrame): Unit =
    refresh(postMutationA, touchedPkA, pkA, currentB, sideIsA = true)

  /** Fold a mutation of side B into the view (mirror of [[refreshA]]). */
  def refreshB(postMutationB: DataFrame, touchedPkB: DataFrame, currentA: DataFrame): Unit =
    refresh(postMutationB, touchedPkB, pkB, currentA, sideIsA = false)

  /** Fold an INSERT-ONLY batch of side A: `state ∪ (batch ⋈ currentB)` —
    * O(batch + batch fanout), no anti-join pass. Valid ONLY for genuinely
    * new rows (SQL INSERT semantics — the view is a bag, so appended rows
    * simply add their join output); an update or delete must go through
    * [[refreshA]]. The batch must carry side A's columns.
    */
  def appendA(insertedA: DataFrame, currentB: DataFrame): Unit =
    append(insertedA, currentB, sideIsA = true)

  /** Mirror of [[appendA]] for an insert-only batch of side B. */
  def appendB(insertedB: DataFrame, currentA: DataFrame): Unit =
    append(insertedB, currentA, sideIsA = false)

  private def append(ins: DataFrame, other: DataFrame, sideIsA: Boolean): Unit =
    this.synchronized {
      val joined =
        if (sideIsA) ins.join(other, joinKeys) else other.join(ins, joinKeys)
      // Eager for the same reason as refresh: the fold must read the other
      // side AS OF NOW, not at some later evaluation.
      val fresh = joined.select(outCols.map(col): _*).localCheckpoint(true)
      merges += 1
      val merged = state0.unionByName(fresh)
      state0 =
        if (merges % MaterializedJoin.CheckpointEvery == 0) merged.localCheckpoint(true)
        else merged
    }

  private def refresh(
      side: DataFrame, touchedPk: DataFrame, pk: Seq[String],
      other: DataFrame, sideIsA: Boolean): Unit = this.synchronized {
    // Checkpoint the touched-key set first: it is read three times (count,
    // anti, semi) and must stay pinned to the PRE-reassignment lineage the
    // caller handed us even if their side frame mutates underneath.
    val touched = touchedPk.select(pk.map(col): _*).distinct().localCheckpoint(true)
    val cap = state0.sparkSession.conf
      .get(MaterializedJoin.BroadcastCapKey, MaterializedJoin.DefaultBroadcastCap.toString)
      .toLong
    // COUNTED broadcast guard, never assumed small: a GDPR backfill can
    // touch most of a table, and a forced broadcast of that key set would
    // OOM the driver. The count is O(|touched|) over checkpointed rows.
    val small = touched.count() <= cap
    def hinted(df: DataFrame) = if (small) broadcast(df) else df
    def keyCond(l: DataFrame, r: DataFrame) =
      pk.map(c => l(c) <=> r(c)).reduce(_ && _)
    val kept = state0.join(hinted(touched), keyCond(state0, touched), "left_anti")
    val freshRows = side.join(hinted(touched), keyCond(side, touched), "left_semi")
    // Canonical column order regardless of which side drove the join.
    val joined =
      if (sideIsA) freshRows.join(other, joinKeys) else other.join(freshRows, joinKeys)
    // Eager: the re-derived rows read the other side AS OF NOW — captured
    // lazily, the caller's next mutation of that side would silently change
    // what this refresh folded in (or read a released lake snapshot).
    val fresh = joined.select(outCols.map(col): _*).localCheckpoint(true)
    merges += 1
    val merged = kept.unionByName(fresh)
    state0 =
      if (merges % MaterializedJoin.CheckpointEvery == 0) merged.localCheckpoint(true)
      else merged
  }

  /** Recompute from both full bases — the escape hatch when the touched
    * set is unknown (e.g. a bulk re-layout that rewrote every row).
    */
  def rebuild(a: DataFrame, b: DataFrame): Unit = this.synchronized {
    state0 = a.join(b, joinKeys).select(outCols.map(col): _*).localCheckpoint(true)
    merges = 0
    rebuilds0 += 1
  }

  private var rebuilds0 = 0

  /** How many times [[rebuild]] ran — observability that the incremental
    * path, not the escape hatch, is doing the maintenance.
    */
  def rebuildCount: Int = this.synchronized(rebuilds0)
}

object MaterializedJoin {

  /** Touched-key sets at or under this COUNT broadcast in the maintenance
    * joins; above it they fail open to AQE shuffle joins.
    */
  val BroadcastCapKey = "spark.graft.mv.broadcastKeyCap"
  val DefaultBroadcastCap = 4000000L

  /** Cut the state lineage every this many merges (state is |view|-sized;
    * the checkpoint is the price of a bounded plan, same policy as
    * [[MaterializedAgg]]).
    */
  val CheckpointEvery = 4

  /** Materialize `a ⋈ b` on `joinKeys` and start maintaining it.
    *
    * Column contract: the two sides share EXACTLY the join key names (any
    * other overlap would make the output ambiguous — rename before
    * building); `pkA`/`pkB` identify rows on their side for the
    * touched-key maintenance contract above.
    */
  def build(
      a: DataFrame, b: DataFrame, joinKeys: Seq[String],
      pkA: Seq[String], pkB: Seq[String]): MaterializedJoin = {
    require(joinKeys.nonEmpty, "join needs at least one key column")
    val aSet = a.columns.toSet
    val bSet = b.columns.toSet
    require(joinKeys.forall(aSet) && joinKeys.forall(bSet),
      s"join keys $joinKeys must exist on both sides")
    val overlap = (aSet & bSet) -- joinKeys
    require(overlap.isEmpty,
      s"sides share non-key columns $overlap — rename them before building")
    require(pkA.nonEmpty && pkA.forall(aSet), s"pkA $pkA must be columns of A")
    require(pkB.nonEmpty && pkB.forall(bSet), s"pkB $pkB must be columns of B")
    val outCols = joinKeys ++
      a.columns.filterNot(joinKeys.contains) ++
      b.columns.filterNot(joinKeys.contains)
    val st = a.join(b, joinKeys).select(outCols.map(col): _*).localCheckpoint(true)
    new MaterializedJoin(joinKeys, pkA, pkB, outCols, st, 0)
  }

  /** Re-adopt persisted state (e.g. reloaded from a lake table) without a
    * rebuild; the caller asserts it equals `a ⋈ b` as of adoption.
    */
  def fromState(
      state: DataFrame, joinKeys: Seq[String],
      pkA: Seq[String], pkB: Seq[String]): MaterializedJoin = {
    val outCols = state.columns.toSeq
    require(joinKeys.forall(outCols.contains) && pkA.forall(outCols.contains) &&
      pkB.forall(outCols.contains),
      "state must carry the join keys and both primary keys")
    new MaterializedJoin(joinKeys, pkA, pkB, outCols, state.localCheckpoint(true), 0)
  }
}
