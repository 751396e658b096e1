package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items summary over a string stream — `k` counters,
  * the classic deterministic heavy-hitters sketch (Misra & Gries 1982;
  * mergeable form from Agarwal et al., "Mergeable Summaries", PODS'12).
  *
  * Invariants carried by every sketch, exploited by the lake's stats
  * catalog ([[graft.lake.FreqMap]]):
  *
  *  - `est(v) ≤ true(v) ≤ est(v) + dec` for every item v (est = 0 when v is
  *    not stored) — `dec` is the cumulative decrement this sketch has ever
  *    applied, an explicit certified error bound (≤ n/(k+1), but tracked
  *    exactly rather than bounded by formula).
  *  - any item with `true(v) > dec` is guaranteed PRESENT.
  *  - `dec == 0` ⇔ no counter was ever evicted ⇔ the sketch holds EVERY
  *    distinct item seen with its EXACT count, and counter addition is
  *    commutative — so in that regime (cardinality ≤ k throughout) merges
  *    are order-independent and answers are deterministic. Above k the
  *    stored set depends on merge order (like any sublinear summary);
  *    specs pin the bounds, gate queries use the exact regime.
  */
final class FreqSketch(val k: Int) {
  val counters: mutable.HashMap[String, Long] = mutable.HashMap.empty
  var n: Long = 0L
  var dec: Long = 0L

  def insert(item: String): Unit = {
    n += 1
    counters.get(item) match {
      case Some(c) => counters.update(item, c + 1)
      case None if counters.size < k => counters.update(item, 1L)
      case None =>
        // classic MG step: decrement every counter, drop zeros. Happens at
        // most n/(k+1) times over a stream, so total work stays O(n).
        dec += 1
        counters.mapValuesInPlace((_, c) => c - 1)
        counters.filterInPlace((_, c) => c > 0)
    }
  }

  /** Mergeable-summaries merge: sum counter maps; if over k counters,
    * subtract the (k+1)-th largest count from all and drop non-positives
    * (that subtraction joins the error bound). Mutates and returns `this`.
    */
  def mergeIn(other: FreqSketch): FreqSketch = {
    other.counters.foreach { case (v, c) =>
      counters.update(v, counters.getOrElse(v, 0L) + c)
    }
    n += other.n
    dec += other.dec
    if (counters.size > k) {
      val cut = counters.values.toArray
        .sorted(Ordering[Long].reverse).apply(k)
      counters.mapValuesInPlace((_, c) => c - cut)
      counters.filterInPlace((_, c) => c > 0)
      dec += cut
    }
    this
  }

  /** Top-j stored items by estimate (ties break by value): each as
    * (value, lower, upper) with `lower = est ≤ true ≤ upper = est + dec`.
    */
  def topK(j: Int): Seq[(String, Long, Long)] =
    counters.toSeq.sortBy { case (v, c) => (-c, v) }.take(j)
      .map { case (v, c) => (v, c, c + dec) }

  /** True iff the sketch is in the exact regime (never evicted): every
    * distinct item seen is stored with its exact count.
    */
  def isExact: Boolean = dec == 0L
}

/** Fixed byte layout for [[FreqSketch]]: k, n, dec, #entries, then
  * (utf8-length, utf8-bytes, count) per entry in SORTED value order — the
  * sort makes serialized bytes a pure function of the sketch's state, so
  * manifests of equal sketches are byte-identical.
  */
object FreqCodec {
  def serialize(s: FreqSketch): Array[Byte] = {
    val entries = s.counters.toArray.sortBy(_._1)
    val encoded = entries.map { case (v, c) =>
      (v.getBytes(java.nio.charset.StandardCharsets.UTF_8), c)
    }
    val bb = java.nio.ByteBuffer.allocate(
      4 + 8 + 8 + 4 + encoded.map(e => 4 + e._1.length + 8).sum)
    bb.putInt(s.k); bb.putLong(s.n); bb.putLong(s.dec)
    bb.putInt(encoded.length)
    encoded.foreach { case (b, c) =>
      bb.putInt(b.length); bb.put(b); bb.putLong(c)
    }
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): FreqSketch = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val s = new FreqSketch(bb.getInt)
    s.n = bb.getLong; s.dec = bb.getLong
    val m = bb.getInt
    var i = 0
    while (i < m) {
      val len = bb.getInt
      val b = new Array[Byte](len); bb.get(b)
      s.counters.update(
        new String(b, java.nio.charset.StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    s
  }
}

/** `freq_agg(col)` — a native TypedImperativeAggregate producing a
  * serialized Misra–Gries frequent-items sketch (BinaryType) of a string
  * column. Spark has no frequent-items aggregate at all (only the
  * DataFrame-level `stat.freqItems`, which neither merges nor persists);
  * the lake's statistics catalog needs the SKETCH ITSELF per
  * partition×bucket cell, mergeable at the driver (see
  * `graft.lake.FreqMap`).
  *
  * NULLs are skipped (SQL aggregate semantics); an all-NULL or empty group
  * evaluates to the serialized EMPTY sketch (the merge identity), never SQL
  * NULL — parity with the other stat-family aggregates.
  */
case class FreqAgg(
    child: Expression,
    k: Int = FreqAgg.DefaultK,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[FreqSketch]
  with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"freq_agg expects a string input (cast first), got ${child.dataType}")
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "freq_agg"

  override def createAggregationBuffer(): FreqSketch = new FreqSketch(k)

  override def update(buffer: FreqSketch, input: InternalRow): FreqSketch = {
    val v = child.eval(input)
    if (v != null) buffer.insert(v.asInstanceOf[UTF8String].toString)
    buffer
  }

  override def merge(a: FreqSketch, b: FreqSketch): FreqSketch = a.mergeIn(b)

  override def eval(buffer: FreqSketch): Any = FreqCodec.serialize(buffer)

  override def serialize(buffer: FreqSketch): Array[Byte] =
    FreqCodec.serialize(buffer)

  override def deserialize(bytes: Array[Byte]): FreqSketch =
    FreqCodec.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): FreqAgg =
    copy(child = newChild)
}

object FreqAgg {
  /** Default counter budget. 64 counters ≈ a few KB per part serialized
    * (values are short categorical strings in practice) and certifies every
    * item above n/65 of a part's stream — the dashboard top-N sweet spot.
    * Columns whose cardinality stays ≤ 64 get EXACT, order-independent
    * counts (the gate query's regime).
    */
  val DefaultK = 64

  /** The aggregate as a Column (input cast to string like the catalog's
    * tracked-column contract).
    */
  def agg(c: Column, k: Int = DefaultK): Column =
    Bridge.column(
      FreqAgg(Bridge.expression(c.cast("string")), k).toAggregateExpression())
}
