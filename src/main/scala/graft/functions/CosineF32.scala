package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Native Catalyst expression: cosine similarity of two `array<float>`
  * columns, computed in double.
  *
  * This is the one place the engine drops below `functions._`: the
  * composed higher-order-function formulation (`zip_with` + `aggregate`)
  * evaluates its lambdas interpreted — measured contending badly across
  * executor threads (SCALING.md) — while this expression participates in
  * whole-stage codegen as a tight loop. Accumulation order matches the HOF
  * version element-by-element, so results are bit-identical (spec-pinned).
  *
  * Array elements are expected non-null (embedding vectors).
  */
case class CosineF32(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_f32 expects two array<float> inputs, got ${left.dataType} / ${right.dataType}")
  }

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getFloat(i).toDouble
      val yv = y.getFloat(i).toDouble
      dot += xv * yv; nx += xv * xv; ny += yv * yv
      i += 1
    }
    // norms need the full arrays even when lengths differ (parity with the
    // HOF version, which computes each norm over its own array)
    var j = n
    while (j < x.numElements()) { val v = x.getFloat(j).toDouble; nx += v * v; j += 1 }
    j = n
    while (j < y.numElements()) { val v = y.getFloat(j).toDouble; ny += v * v; j += 1 }
    if (nx == 0.0 || ny == 0.0) 0.0 else dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // Fresh names: several CosineF32 instances routinely share one
      // codegen function (assignToCentroids emits one per centroid in a
      // single projection); raw names would collide and demote the whole
      // stage to interpreted eval.
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val v = ctx.freshName("v")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
      int $n = java.lang.Math.min($a.numElements(), $b.numElements());
      double $dot = 0.0, $nx = 0.0, $ny = 0.0;
      for (int $i = 0; $i < $n; $i++) {
        double $xv = (double) $a.getFloat($i);
        double $yv = (double) $b.getFloat($i);
        $dot += $xv * $yv; $nx += $xv * $xv; $ny += $yv * $yv;
      }
      for (int $j = $n; $j < $a.numElements(); $j++) {
        double $v = (double) $a.getFloat($j); $nx += $v * $v;
      }
      for (int $j = $n; $j < $b.numElements(); $j++) {
        double $v = (double) $b.getFloat($j); $ny += $v * $v;
      }
      ${ev.value} = ($nx == 0.0 || $ny == 0.0)
        ? 0.0 : $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineF32 =
    copy(left = newLeft, right = newRight)
}

object CosineF32 {
  /** Column-level entry point. */
  def apply(a: Column, b: Column): Column =
    Bridge.column(CosineF32(Bridge.expression(a), Bridge.expression(b)))
}
