package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Union}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Theta sketches: distinct-count SET ALGEBRA the HLL family cannot do.
  *
  * HLL sketches union losslessly but cannot intersect or subtract — the
  * audience-overlap questions a lakehouse gets daily ("how many users both
  * viewed and purchased", "how many day-1 users returned day-2", "net-new
  * uniques this batch") need Theta sketches, whose intersection/A-not-B
  * are first-class with bounded relative error (~1/√k on the smaller
  * operand). One sketch per group, k-row set algebra after — the exact
  * computation would re-shuffle the raw corpus per question; the sketches
  * answer ALL pairwise questions from one pass.
  *
  * Estimates are sketch-internal (engine-specific hashing) → the gate is
  * rows-only with an EXACT TWIN (`q34_overlap_exact`: SQL COUNT(DISTINCT)
  * intersections on the same groups); ThetaSpec pins <2% error vs exact
  * and merge associativity.
  *
  * ALSO a maintained catalog family since r14: every sketch-tracked lake
  * column carries a per-cell theta TWIN beside its HLL entry
  * ([[graft.lake.HllMap.ThetaPrefix]]), same tightness/fold/severing
  * contract, so `SHOW OVERLAP` answers zero-scan at ALL intersection
  * sizes — exactly, while groups stay under nominal entries.
  */
object ThetaCodec {
  /** log2 nominal entries — 4096 retained hashes, ~1.6% RSE. */
  val LgK = 12

  def emptyUnion(lgK: Int = LgK): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  def wrap(bytes: Array[Byte]): CompactSketch =
    org.apache.datasketches.theta.Sketches.wrapCompactSketch(Memory.wrap(bytes))

  def acceptsType(dt: DataType): Boolean = dt match {
    case IntegerType | LongType | StringType | BinaryType => true
    case _ => false
  }
}

/** `theta_sketch_agg(col)` — serialized compact Theta sketch of a group's
  * distinct values. NULLs skip; an empty group evaluates to the serialized
  * EMPTY sketch (the merge identity), never SQL NULL.
  */
case class ThetaSketchAgg(
    child: Expression,
    lgK: Int = ThetaCodec.LgK,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union]
  with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (ThetaCodec.acceptsType(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"theta_sketch_agg expects int/long/string/binary, got ${child.dataType}")
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "theta_sketch_agg"

  override def createAggregationBuffer(): Union = ThetaCodec.emptyUnion(lgK)

  override def update(buffer: Union, input: InternalRow): Union = {
    child.eval(input) match {
      case null => ()
      case l: Long => buffer.update(l)
      case i: Int => buffer.update(i.toLong)
      case s: UTF8String => buffer.update(s.toString)
      case b: Array[Byte] => buffer.update(b)
      case other => throw new IllegalStateException(
        s"theta_sketch_agg: unexpected value $other")
    }
    buffer
  }

  override def merge(a: Union, b: Union): Union = { a.union(b.getResult); a }

  override def eval(buffer: Union): Any = buffer.getResult.toByteArray

  override def serialize(buffer: Union): Array[Byte] = buffer.getResult.toByteArray

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = ThetaCodec.emptyUnion(lgK)
    u.union(ThetaCodec.wrap(bytes))
    u
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ThetaSketchAgg =
    copy(child = newChild)
}

/** `theta_union_agg(sketch_col)` — union of serialized sketches (the
  * re-aggregation path: per-group sketches → global sketch).
  */
case class ThetaUnionAgg(
    child: Expression,
    lgK: Int = ThetaCodec.LgK,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union]
  with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"theta_union_agg expects serialized sketches (binary), got ${child.dataType}")
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "theta_union_agg"

  override def createAggregationBuffer(): Union = ThetaCodec.emptyUnion(lgK)

  override def update(buffer: Union, input: InternalRow): Union = {
    child.eval(input) match {
      case null => ()
      case b: Array[Byte] => buffer.union(ThetaCodec.wrap(b))
    }
    buffer
  }

  override def merge(a: Union, b: Union): Union = { a.union(b.getResult); a }
  override def eval(buffer: Union): Any = buffer.getResult.toByteArray
  override def serialize(buffer: Union): Array[Byte] = buffer.getResult.toByteArray
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = ThetaCodec.emptyUnion(lgK)
    u.union(ThetaCodec.wrap(bytes))
    u
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ThetaUnionAgg =
    copy(child = newChild)
}

/** Estimate of a serialized sketch's distinct count. CodegenFallback is
  * fine: set-algebra expressions run over GROUP-count-sized frames (k
  * rows), never the corpus.
  */
case class ThetaEstimate(child: Expression)
  extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "theta_estimate"
  override protected def nullSafeEval(input: Any): Any =
    ThetaCodec.wrap(input.asInstanceOf[Array[Byte]]).getEstimate
  override protected def withNewChildInternal(newChild: Expression): ThetaEstimate =
    copy(child = newChild)
}

/** Estimated |A ∩ B| of two serialized sketches. */
case class ThetaIntersectEstimate(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "theta_intersect_estimate"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    SetOperation.builder().buildIntersection()
      .intersect(ThetaCodec.wrap(a.asInstanceOf[Array[Byte]]),
        ThetaCodec.wrap(b.asInstanceOf[Array[Byte]]))
      .getEstimate
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ThetaIntersectEstimate =
    copy(left = newLeft, right = newRight)
}

/** Estimated |A \ B| of two serialized sketches. */
case class ThetaANotBEstimate(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "theta_a_not_b_estimate"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    SetOperation.builder().buildANotB()
      .aNotB(ThetaCodec.wrap(a.asInstanceOf[Array[Byte]]),
        ThetaCodec.wrap(b.asInstanceOf[Array[Byte]]))
      .getEstimate
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ThetaANotBEstimate =
    copy(left = newLeft, right = newRight)
}

object ThetaAgg {

  /** ALL pairwise overlaps between groups from ONE scan: per-group theta
    * sketches, then the k² set-algebra matrix — the day-over-day /
    * segment-retention dashboard. The exact computation is a self-join of
    * the distinct (group, id) table PER QUESTION; this answers every pair
    * at once and never rescans.
    *
    * The matrix itself folds on the DRIVER: k sketches collect (k = group
    * count — a dashboard dimension, bounded by the loud `maxGroups`
    * require, same discipline as the catalog stat folds), pairs compute
    * locally in O(k²) sketch ops. Returns every unordered pair `g_a <
    * g_b` with rounded (only_a, only_b, both_ab, union_ab) estimates —
    * including never-co-occurring pairs (both_ab = 0), which a join-based
    * exact query silently drops.
    */
  def overlapMatrix(
      df: org.apache.spark.sql.DataFrame, groupCol: String, idCol: String,
      lgK: Int = ThetaCodec.LgK, maxGroups: Int = 1000)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.col
    val spark = df.sparkSession
    val rows = df.groupBy(groupCol)
      .agg(sketch(col(idCol), lgK).as("sk"))
      .collect()
    require(rows.length <= maxGroups,
      s"overlapMatrix: ${rows.length} groups exceed maxGroups=$maxGroups — " +
        "this operator is for dashboard-sized dimensions; raise the cap " +
        "explicitly if the k^2 matrix is really wanted")
    val sks = rows.map(r => r.get(0).toString ->
      ThetaCodec.wrap(r.getAs[Array[Byte]](1))).sortBy(_._1)
    val out = for {
      i <- sks.indices; j <- (i + 1) until sks.length
      (ga, a) = sks(i); (gb, b) = sks(j)
    } yield {
      val both = SetOperation.builder().buildIntersection().intersect(a, b).getEstimate
      val aOnly = SetOperation.builder().buildANotB().aNotB(a, b).getEstimate
      val bOnly = SetOperation.builder().buildANotB().aNotB(b, a).getEstimate
      val u = ThetaCodec.emptyUnion(); u.union(a); u.union(b)
      (ga, gb, math.round(aOnly), math.round(bOnly),
        math.round(both), math.round(u.getResult.getEstimate))
    }
    import spark.implicits._
    out.toSeq.toDF("g_a", "g_b", "only_a", "only_b", "both_ab", "union_ab")
  }

  def sketch(c: Column, lgK: Int = ThetaCodec.LgK): Column =
    Bridge.column(ThetaSketchAgg(Bridge.expression(c), lgK).toAggregateExpression())
  def unionAgg(c: Column, lgK: Int = ThetaCodec.LgK): Column =
    Bridge.column(ThetaUnionAgg(Bridge.expression(c), lgK).toAggregateExpression())
  def estimate(c: Column): Column =
    Bridge.column(ThetaEstimate(Bridge.expression(c)))
  def intersectEstimate(a: Column, b: Column): Column =
    Bridge.column(ThetaIntersectEstimate(Bridge.expression(a), Bridge.expression(b)))
  def aNotBEstimate(a: Column, b: Column): Column =
    Bridge.column(ThetaANotBEstimate(Bridge.expression(a), Bridge.expression(b)))
}
