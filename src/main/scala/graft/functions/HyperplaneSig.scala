package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Native Catalyst expression: random-hyperplane LSH signature of an
  * `array<float>` vector over a CONSTANT plane matrix — bit i set when
  * `dot(vec, plane_i) >= 0`, the bucket key of
  * [[graft.operators.Dedup.embeddingNearDup]].
  *
  * Replaces per-plane `aggregate(zip_with(...))` higher-order functions:
  * HOF lambdas evaluate interpreted and contend across executor threads
  * (the measured 10× pathology in SCALING.md), and the signature is the
  * full-corpus pass of embedding near-dup. Dot products accumulate
  * element-by-element in double, in plane order — identical bits to the
  * HOF form (spec-pinned on real embeddings), INCLUDING on dimension
  * mismatch: a vector whose length differs from the plane's leaves the bit
  * clear, as the null-padded zip_with dot does.
  */
case class HyperplaneSig(child: Expression, planes: Array[Array[Double]])
    extends UnaryExpression {
  require(planes.nonEmpty && planes.length <= 64, "1..64 planes per long signature")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_sig expects array<float>, got $other")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var sig = 0L
    var p = 0
    while (p < planes.length) {
      val pl = planes(p)
      // Dimension mismatch leaves bit p CLEAR — the HOF form's semantics
      // (zip_with pads the shorter side with null, the aggregate dot goes
      // null, and `null >= 0` is not true). Dotting over min(length) here
      // would bucket a truncated/overlong vector differently than the
      // composed form this expression replaces.
      if (x.numElements() == pl.length) {
        var dot = 0.0
        var i = 0
        while (i < pl.length) { dot += x.getFloat(i).toDouble * pl(i); i += 1 }
        if (dot >= 0.0) sig |= 1L << p
      }
      p += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val mat = ctx.addReferenceObj("planes", planes, "double[][]")
      val sig = ctx.freshName("sig")
      val p = ctx.freshName("p")
      val pl = ctx.freshName("pl")
      val dot = ctx.freshName("dot")
      val i = ctx.freshName("i")
      s"""
      long $sig = 0L;
      for (int $p = 0; $p < $mat.length; $p++) {
        double[] $pl = $mat[$p];
        if ($a.numElements() == $pl.length) {
          double $dot = 0.0;
          for (int $i = 0; $i < $pl.length; $i++) {
            $dot += ((double) $a.getFloat($i)) * $pl[$i];
          }
          if ($dot >= 0.0) $sig |= 1L << $p;
        }
      }
      ${ev.value} = $sig;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSig =
    copy(child = newChild)
}

object HyperplaneSig {
  /** Column-level entry point; `planes(i)` owns bit i. */
  def apply(vec: Column, planes: Seq[Seq[Double]]): Column =
    Bridge.column(HyperplaneSig(Bridge.expression(vec),
      planes.map(_.toArray).toArray))
}
