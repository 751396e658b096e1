package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Native Catalyst expression: the id of the cosine-nearest centroid for an
  * `array<float>` vector, over a CONSTANT centroid matrix.
  *
  * The composed form — `array_max(array(struct(cosine(v, c0), 0), ...))`
  * with one [[CosineF32]] per centroid — inlines k unrolled dot-product
  * loops into one generated method; by k ≈ 80 the method blows HotSpot's
  * 8 KB JIT limit and the whole stage runs INTERPRETED (measured: a
  * 60k-row × 80-centroid assignment pass took ~20s; this expression does
  * the identical arithmetic in one JIT-able nested loop). Centroid
  * assignment is the inner loop of IVF build, add, and batch probes, so
  * this is the hot path of the whole ANN surface.
  *
  * Tie-breaking matches the composed form exactly: `array_max` on
  * `struct(score, cid)` compares lexicographically, so equal scores pick
  * the LARGER cid (`>=` below). Scores accumulate element-by-element in
  * double, identical to [[CosineF32]] — bit-equal assignments, spec-pinned.
  *
  * Centroid ids may be sparse (a recluster splits ids out of the middle);
  * rows sort by ascending id so the positional tie-break equals the id
  * tie-break.
  */
case class CentroidArgmax(
    child: Expression, centroids: Array[Array[Float]], ids: Array[Int])
    extends UnaryExpression {
  require(ids.length == centroids.length, "one id per centroid row")
  require(ids.sorted.sameElements(ids),
    "ids must ascend so position ties reproduce array_max's larger-cid tie-break")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) if centroids.nonEmpty =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(FloatType, _) =>
      TypeCheckResult.TypeCheckFailure("centroid_argmax needs >= 1 centroid")
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"centroid_argmax expects array<float>, got $other")
  }

  override def dataType: DataType = IntegerType

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var best = 0
    var bestScore = Double.NegativeInfinity
    var c = 0
    while (c < centroids.length) {
      val cv = centroids(c)
      val n = math.min(x.numElements(), cv.length)
      var dot = 0.0; var nx = 0.0; var ny = 0.0
      var i = 0
      while (i < n) {
        val xv = x.getFloat(i).toDouble
        val yv = cv(i).toDouble
        dot += xv * yv; nx += xv * xv; ny += yv * yv
        i += 1
      }
      var j = n
      while (j < x.numElements()) { val v = x.getFloat(j).toDouble; nx += v * v; j += 1 }
      j = n
      while (j < cv.length) { val v = cv(j).toDouble; ny += v * v; j += 1 }
      val s = if (nx == 0.0 || ny == 0.0) 0.0
        else dot / (math.sqrt(nx) * math.sqrt(ny))
      // Double.compare, not >=: array_max orders doubles by the total
      // order (NaN greatest, 0.0 > -0.0), and a corrupt NaN embedding must
      // route identically to the composed form.
      if (java.lang.Double.compare(s, bestScore) >= 0) { bestScore = s; best = c }
      c += 1
    }
    ids(best)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val mat = ctx.addReferenceObj("centroids", centroids, "float[][]")
      val idArr = ctx.addReferenceObj("ids", ids, "int[]")
      val best = ctx.freshName("best")
      val bestScore = ctx.freshName("bestScore")
      val c = ctx.freshName("c")
      val cv = ctx.freshName("cv")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val v = ctx.freshName("v")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val s = ctx.freshName("s")
      s"""
      int $best = 0;
      double $bestScore = Double.NEGATIVE_INFINITY;
      for (int $c = 0; $c < $mat.length; $c++) {
        float[] $cv = $mat[$c];
        int $n = java.lang.Math.min($a.numElements(), $cv.length);
        double $dot = 0.0, $nx = 0.0, $ny = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          double $xv = (double) $a.getFloat($i);
          double $yv = (double) $cv[$i];
          $dot += $xv * $yv; $nx += $xv * $xv; $ny += $yv * $yv;
        }
        for (int $j = $n; $j < $a.numElements(); $j++) {
          double $v = (double) $a.getFloat($j); $nx += $v * $v;
        }
        for (int $j = $n; $j < $cv.length; $j++) {
          double $v = (double) $cv[$j]; $ny += $v * $v;
        }
        double $s = ($nx == 0.0 || $ny == 0.0)
          ? 0.0 : $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
        if (java.lang.Double.compare($s, $bestScore) >= 0) { $bestScore = $s; $best = $c; }
      }
      ${ev.value} = $idArr[$best];
      """
    })

  override protected def withNewChildInternal(newChild: Expression): CentroidArgmax =
    copy(child = newChild)
}

object CentroidArgmax {
  /** Column-level entry point over (cid, vector) pairs; ids may be sparse
    * (post-recluster) but must ascend.
    */
  def apply(vec: Column, centroids: Seq[(Int, Seq[Double])]): Column = {
    val sorted = centroids.sortBy(_._1)
    Bridge.column(CentroidArgmax(Bridge.expression(vec),
      sorted.map(_._2.map(_.toFloat).toArray).toArray,
      sorted.map(_._1).toArray))
  }
}
