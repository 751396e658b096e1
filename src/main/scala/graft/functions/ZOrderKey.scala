package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Native Catalyst expression: Z-order (Morton) clustering key of N numeric
  * columns — the multi-dimensional layout key lakehouse engines cluster files
  * by so that zone-map skipping works on EVERY clustered column, not just a
  * sort-leading one (a linear sort gives tight min/max intervals on its first
  * column only; interleaving quantile-rank bits gives intervals ~uniformly
  * tight across all of them).
  *
  * Per column: the value's QUANTILE RANK (binary search over precomputed
  * approx-quantile boundaries — rank-based, so skewed distributions still fill
  * the rank space evenly), then bit i of column j lands at position
  * `i*ncols + j` of the result. NULL ranks 0 — nulls cluster with the lowest
  * values, and zone pruning on other columns is unaffected.
  *
  * The expression is a pure layout key: it decides WHERE a row is written,
  * never what a query answers, so approximate boundaries cost only pruning
  * efficiency, not correctness.
  */
case class ZOrderKey(children: Seq[Expression], bounds: Array[Array[Double]], bits: Int)
    extends Expression {
  require(children.nonEmpty && children.length == bounds.length,
    "one boundary array per clustered column")
  require(bits >= 1 && bits * children.length <= 63,
    s"bits*cols must fit a positive long, got $bits*${children.length}")
  require(bounds.forall(_.length == (1 << bits) - 1),
    s"each boundary array must hold 2^bits-1 = ${(1 << bits) - 1} cut points")

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def foldable: Boolean = children.forall(_.foldable)

  override def checkInputDataTypes(): TypeCheckResult =
    children.find(_.dataType != DoubleType) match {
      case Some(c) => TypeCheckResult.TypeCheckFailure(
        s"zorder_key expects double inputs (cast first), got ${c.dataType}")
      case None => TypeCheckResult.TypeCheckSuccess
    }

  override def eval(input: InternalRow): Any = {
    var z = 0L
    var j = 0
    while (j < children.length) {
      val v = children(j).eval(input)
      val rank =
        if (v == null) 0
        else ZOrderKey.rank(bounds(j), v.asInstanceOf[Double])
      z |= ZOrderKey.spread(rank, j, children.length, bits)
      j += 1
    }
    z
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val boundsRef = ctx.addReferenceObj("zorderBounds", bounds, "double[][]")
    val z = ctx.freshName("z")
    val evals = children.zipWithIndex.map { case (c, j) =>
      val e = c.genCode(ctx)
      val rank = ctx.freshName("rank")
      s"""
      ${e.code}
      int $rank = ${e.isNull} ? 0
        : graft.functions.ZOrderKey.rank($boundsRef[$j], ${e.value});
      $z |= graft.functions.ZOrderKey.spread($rank, $j, ${children.length}, $bits);
      """
    }.mkString("\n")
    ev.copy(
      code = code"""
        long $z = 0L;
        $evals
        long ${ev.value} = $z;
        """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ZOrderKey = copy(children = newChildren)
}

object ZOrderKey {
  /** Quantile rank of `v` in 0..2^bits-1: the number of cut points <= v.
    * Pure function of (boundaries, value) — layout is deterministic given the
    * same boundary snapshot. NaN ranks last (binarySearch total order).
    */
  def rank(cuts: Array[Double], v: Double): Int = {
    val i = java.util.Arrays.binarySearch(cuts, v)
    if (i >= 0) {
      // Equal runs of cut points (heavy skew collapses quantiles): take the
      // UPPER edge of the run so every equal value gets one deterministic
      // rank regardless of which run member binarySearch landed on.
      var j = i
      while (j + 1 < cuts.length && cuts(j + 1) == v) j += 1
      j + 1
    } else -(i + 1)
  }

  /** Scatter `rank`'s low `bits` bits so bit i lands at `i*ncols + j`. */
  def spread(rank: Int, j: Int, ncols: Int, bits: Int): Long = {
    var out = 0L
    var i = 0
    while (i < bits) {
      out |= ((rank >> i) & 1L) << (i * ncols + j)
      i += 1
    }
    out
  }

  /** Column-level entry point; children are cast to double here. */
  def apply(cols: Seq[Column], bounds: Array[Array[Double]], bits: Int): Column =
    Bridge.column(ZOrderKey(
      cols.map(c => Bridge.expression(c.cast(DoubleType))), bounds, bits))
}
