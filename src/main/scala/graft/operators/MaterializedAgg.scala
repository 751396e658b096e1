package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incrementally-maintained aggregate view: per-group SUM / COUNT / MIN /
  * MAX state that updates from each INSERTED batch alone — the base table is
  * never rescanned after the initial build.
  *
  * The 100 TB shape: maintenance cost is `O(|batch|) + O(|groups|)` per
  * insert. The batch pre-aggregates map-side (partial aggregation), the
  * shuffle carries one row per touched group, and the merge is an outer join
  * of two group-keyed frames — the base table's size never appears in the
  * plan again. A periodic dashboard aggregate over an append-only 100 TB
  * fact table costs one small merge per ingest instead of a full scan per
  * refresh.
  *
  * Contract: INSERT-ONLY maintenance. SUM/COUNT are self-inverse under
  * appends; MIN/MAX are monotone under appends but NOT under updates or
  * deletes — after an upsert or delete of base rows, call [[rebuild]].
  * (The same contract as materialized-view engines that restrict
  * incremental refresh to insert-only deltas for non-invertible aggregates.)
  *
  * Numeric exactness: use [[MaterializedAgg.sumDecimal]] for floating-point
  * measures — decimal addition is associative, so the incrementally merged
  * total is bit-equal to a one-shot aggregate no matter how the inserts were
  * batched (a double sum would drift with batching order).
  */
final class MaterializedAgg private (
    groupCols: Seq[String],
    aggs: Seq[MaterializedAgg.AggCol],
    private var state0: DataFrame,
    private var merges: Int) {

  /** Current view contents: one row per group, `groupCols ++ aliases`. */
  def state: DataFrame = state0

  /** The view's grouping columns (for consumers routing changes by group). */
  def groupColumns: Seq[String] = groupCols

  /** Fold one inserted batch into the view. */
  def applyInsert(batch: DataFrame): Unit = this.synchronized {
    // The partial is |touched groups| rows — checkpoint it NOW so the view's
    // plan never references the batch's (caller-owned) data: a lake-backed
    // batch frame can have its snapshot released by the table's next
    // mutation, and a lazy reference from here would read freed blocks.
    val delta = MaterializedAgg.aggregate(batch, groupCols, aggs)
      .localCheckpoint(true)
    // Qualified string columns, not df(col): state and delta often share
    // lineage (both aggregate the same source), and df-bound references
    // trip Spark's ambiguous-self-join detection.
    val l = state0.alias("l")
    val r = delta.alias("r")
    def lc(c: String) = col(s"l.$c")
    def rc(c: String) = col(s"r.$c")
    val cond = groupCols.map(c => lc(c) <=> rc(c)).reduce(_ && _)
    val merged = l.join(r, cond, "full_outer").select(
      groupCols.map(c => coalesce(lc(c), rc(c)).as(c)) ++
        aggs.map(a => a.merge(lc(a.alias), rc(a.alias)).as(a.alias)): _*)
    // Bounded lineage: each merge stacks one join on the state plan; cut it
    // every few merges so a long-lived view never accumulates an unbounded
    // plan (the state is |groups|-sized — checkpointing it is cheap).
    merges += 1
    state0 =
      if (merges % MaterializedAgg.CheckpointEvery == 0) merged.localCheckpoint(true)
      else merged
  }

  /** Targeted refresh after a DELETE (or update): recompute ONLY the groups
    * the mutation touched, from the post-mutation base pruned to those
    * groups; every other group's state is untouched. MIN/MAX are not
    * invertible and a SUM's null-ness depends on whether any non-null value
    * remains — so subtraction alone cannot maintain them, but a per-touched-
    * group recompute is exact for every aggregate, and costs base rows of
    * the touched groups, not the table. (The standard partial-refresh
    * design for non-invertible aggregates.)
    *
    * `touchedRows` needs only the group columns of the mutated rows;
    * `postMutationBase` is the base AFTER the mutation. Groups that lost
    * their last row disappear from the view.
    */
  def refreshGroups(postMutationBase: DataFrame, touchedRows: DataFrame): Unit =
    this.synchronized {
      val touched = touchedRows.select(groupCols.map(col): _*).distinct()
        .localCheckpoint(true) // small; read twice below
      def keyCond(l: DataFrame, r: DataFrame) =
        groupCols.map(c => l(c) <=> r(c)).reduce(_ && _)
      // null-safe joins: a NULL group key is a group like any other
      val kept = state0.join(touched, keyCond(state0, touched), "left_anti")
      // Checkpoint eagerly (|touched groups| rows): the recompute reads the
      // base AS OF NOW — captured lazily, the base's next mutation would
      // release the snapshot this plan reads (freed-block reads), and a
      // late evaluation would see the WRONG table state anyway.
      val refreshed = MaterializedAgg.aggregate(
        postMutationBase.join(broadcast(touched),
          keyCond(postMutationBase, touched), "left_semi"),
        groupCols, aggs).localCheckpoint(true)
      merges += 1
      val merged = kept.unionByName(refreshed)
      state0 =
        if (merges % MaterializedAgg.CheckpointEvery == 0) merged.localCheckpoint(true)
        else merged
    }

  /** Recompute from the full base — the escape hatch when the touched-group
    * set is unknown, or when the touched set covers ≈ all groups (a
    * targeted refresh would then pay pin + per-group recompute ≈ 2× this
    * single aggregate).
    */
  def rebuild(base: DataFrame): Unit = this.synchronized {
    state0 = MaterializedAgg.aggregate(base, groupCols, aggs).localCheckpoint(true)
    merges = 0
    rebuilds0 += 1
  }

  private var rebuilds0 = 0

  /** How many times [[rebuild]] ran — observability for maintenance-path
    * selection (the SQL layer's degenerate-case escape asserts on it).
    */
  def rebuildCount: Int = this.synchronized(rebuilds0)
}

object MaterializedAgg {

  /** Merges between lineage cuts of the state plan. */
  val CheckpointEvery = 8

  /** One maintained aggregate column: how to compute it over a batch and how
    * to merge a batch's partial with the current state. Both sides of
    * `merge` may be NULL (group absent from one side, or an all-null
    * measure) — merges must treat NULL as "no contribution", never as zero.
    */
  final case class AggCol(
      alias: String,
      agg: Column,
      merge: (Column, Column) => Column)

  /** Additive merge where NULL means no contribution (SUM, COUNT). */
  private def nullFreeAdd(l: Column, r: Column): Column =
    when(l.isNull && r.isNull, lit(null))
      .otherwise(coalesce(l, lit(0)) + coalesce(r, lit(0)))

  def count(alias: String): AggCol =
    AggCol(alias, org.apache.spark.sql.functions.count(lit(1)),
      (l, r) => nullFreeAdd(l, r).cast("long"))

  /** COUNT(c) — non-null values only (AVG's denominator under SQL null
    * semantics; decomposing AVG into sumDecimal/countNonNull keeps the
    * merged average exact and insert-maintainable).
    */
  def countNonNull(c: String, alias: String): AggCol =
    AggCol(alias, org.apache.spark.sql.functions.count(col(c)),
      (l, r) => nullFreeAdd(l, r).cast("long"))

  /** Exact decimal SUM of a (possibly floating-point) measure — associative,
    * so incremental merges reproduce the one-shot aggregate exactly.
    */
  def sumDecimal(c: String, alias: String, scale: Int = 2): AggCol = {
    val dt = org.apache.spark.sql.types.DecimalType(38, scale)
    AggCol(alias, org.apache.spark.sql.functions.sum(col(c).cast(dt)),
      (l, r) => nullFreeAdd(l, r).cast(dt))
  }

  def sum(c: String, alias: String): AggCol =
    AggCol(alias, org.apache.spark.sql.functions.sum(col(c)), nullFreeAdd)

  /** `least`/`greatest` skip NULLs — absent-side groups keep the other side. */
  def min(c: String, alias: String): AggCol =
    AggCol(alias, org.apache.spark.sql.functions.min(col(c)), (l, r) => least(l, r))

  def max(c: String, alias: String): AggCol =
    AggCol(alias, org.apache.spark.sql.functions.max(col(c)), (l, r) => greatest(l, r))

  private def aggregate(df: DataFrame, groupCols: Seq[String], aggs: Seq[AggCol]): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(aggs.head.agg.as(aggs.head.alias),
        aggs.tail.map(a => a.agg.as(a.alias)): _*)

  /** Build the view from the base table's current contents. */
  def build(base: DataFrame, groupCols: Seq[String], aggs: Seq[AggCol]): MaterializedAgg = {
    require(groupCols.nonEmpty && aggs.nonEmpty, "need group columns and aggregates")
    require(aggs.map(_.alias).distinct.length == aggs.length, "duplicate aggregate alias")
    new MaterializedAgg(groupCols, aggs,
      aggregate(base, groupCols, aggs).localCheckpoint(true), 0)
  }

  /** Rehydrate from a PERSISTED state (one row per group, `groupCols ++
    * aliases`) — the O(groups) load path: no base scan, maintenance
    * continues exactly where the saved state left off. The caller vouches
    * that `state` was produced by a view with the same groupCols/aggs
    * (the SQL layer persists the defining query alongside and re-derives
    * both from it).
    */
  def fromState(state: DataFrame, groupCols: Seq[String], aggs: Seq[AggCol]): MaterializedAgg = {
    require(groupCols.nonEmpty && aggs.nonEmpty, "need group columns and aggregates")
    val want = (groupCols ++ aggs.map(_.alias)).toSet
    require(state.columns.toSet == want,
      s"state columns ${state.columns.mkString(",")} do not match the view shape")
    new MaterializedAgg(groupCols, aggs, state.localCheckpoint(true), 0)
  }
}
