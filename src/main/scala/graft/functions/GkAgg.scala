package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.QuantileSummaries
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Serialization codec for Spark's Greenwald–Khanna [[QuantileSummaries]]
  * — the deterministic mergeable rank summary behind Spark's own
  * `percentile_approx`. One fixed little layout: relativeError, sampled
  * length, count, then (value, g, delta) triples. Compresses before
  * writing, so every serialized summary is query- and merge-ready.
  */
object GkCodec {
  def serialize(qs0: QuantileSummaries): Array[Byte] = {
    val qs = if (qs0.compressed) qs0 else qs0.compress()
    val sampled = qs.sampled
    val bb = java.nio.ByteBuffer.allocate(8 + 4 + 8 + sampled.length * 24)
    bb.putDouble(qs.relativeError)
    bb.putInt(sampled.length)
    bb.putLong(qs.count)
    sampled.foreach { s => bb.putDouble(s.value); bb.putLong(s.g); bb.putLong(s.delta) }
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): QuantileSummaries = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val eps = bb.getDouble
    val n = bb.getInt
    val count = bb.getLong
    val stats = Array.fill(n)(
      QuantileSummaries.Stats(bb.getDouble, bb.getLong, bb.getLong))
    new QuantileSummaries(
      QuantileSummaries.defaultCompressThreshold, eps, stats, count, true)
  }

  /** Compress-then-merge — THE one merge discipline, shared by the
    * distributed aggregate ([[GkAgg.merge]]) and the catalog fold
    * (`QuantileMap`), so the two paths cannot silently diverge.
    */
  def mergeCompressed(a: QuantileSummaries, b: QuantileSummaries): QuantileSummaries = {
    val ac = if (a.compressed) a else a.compress()
    val bc = if (b.compressed) b else b.compress()
    ac.merge(bc)
  }
}

/** `gk_agg(col)` — a native TypedImperativeAggregate producing a serialized
  * Greenwald–Khanna quantile summary (BinaryType) of a double column.
  *
  * Spark exposes GK only through `percentile_approx`, which answers a fixed
  * quantile and throws the summary away; the lake's statistics catalog needs
  * the SUMMARY ITSELF per partition×bucket cell, mergeable at the driver
  * (see `graft.lake.QuantileMap`), so this aggregate surfaces it. Same
  * machinery end to end: updates insert into a [[QuantileSummaries]], shuffle
  * partials serialize through [[GkCodec]], merges use
  * `QuantileSummaries.merge` — so a catalog fold and a distributed
  * `percentile_approx` scan share one error model (rank error ≤ ~2ε after
  * merging, the GK merge bound Spark itself relies on; ε = relativeError).
  *
  * Determinism caveat, documented rather than hidden: GK insert/merge are
  * deterministic FUNCTIONS, but the summary's sampled tuples depend on the
  * ORDER partials merge in, which Spark does not fix across runs. Answers
  * are therefore reproducible only up to the ε rank bound — exactly like
  * `percentile_approx` itself — and specs pin the bound, not the bits.
  *
  * NULLs are skipped (SQL aggregate semantics); an all-NULL or empty group
  * evaluates to the serialized EMPTY summary (the merge identity), never
  * SQL NULL — parity with how the stats catalog treats empty cells.
  */
case class GkAgg(
    child: Expression,
    relativeError: Double = GkAgg.DefaultEps,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QuantileSummaries]
  with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"gk_agg expects a double input (cast numerics first), got ${child.dataType}")
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "gk_agg"

  override def createAggregationBuffer(): QuantileSummaries =
    new QuantileSummaries(QuantileSummaries.defaultCompressThreshold, relativeError)

  override def update(buffer: QuantileSummaries, input: InternalRow): QuantileSummaries = {
    val v = child.eval(input)
    if (v == null) buffer else buffer.insert(v.asInstanceOf[Double])
  }

  override def merge(a: QuantileSummaries, b: QuantileSummaries): QuantileSummaries =
    GkCodec.mergeCompressed(a, b)

  override def eval(buffer: QuantileSummaries): Any = GkCodec.serialize(buffer)

  override def serialize(buffer: QuantileSummaries): Array[Byte] =
    GkCodec.serialize(buffer)

  override def deserialize(bytes: Array[Byte]): QuantileSummaries =
    GkCodec.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): GkAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GkAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): GkAgg =
    copy(child = newChild)
}

object GkAgg {
  /** Default relative rank error. 0.01 keeps a part's summary at a few KB
    * (O((1/ε)·log(εn)) tuples × 24 bytes) — the manifest-budget sweet spot
    * for a per-part statistic; callers needing tighter answers aggregate
    * with an explicit ε.
    */
  val DefaultEps = 0.01

  /** The aggregate as a Column (input cast to double like any numeric agg). */
  def agg(c: Column, eps: Double = DefaultEps): Column =
    Bridge.column(
      GkAgg(Bridge.expression(c.cast("double")), eps).toAggregateExpression())
}
