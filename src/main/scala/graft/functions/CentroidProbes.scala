package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Native Catalyst expression: the ids of the `nprobe` cosine-nearest
  * centroids for an `array<float>` vector — the per-query probe selection
  * of the batch ANN join ([[graft.operators.Similarity.ivfBatchTopK]]).
  *
  * Same JIT story as [[CentroidArgmax]]: the composed
  * `slice(array_sort(array(struct(-cosine, cid) × k)), 1, nprobe)` form
  * inlines k cosine loops into one generated method and falls out of JIT
  * compilation past k ≈ 80; this expression is one nested loop plus an
  * nprobe-sized insertion, JIT-able at any list count.
  *
  * Ordering matches the composed form exactly: `array_sort` ascending on
  * `(-score, cid)` = score DESC, ties by SMALLER cid. Scores accumulate
  * element-by-element in double like [[CosineF32]].
  */
case class CentroidProbes(
    child: Expression, centroids: Array[Array[Float]], ids: Array[Int],
    nprobe: Int)
    extends UnaryExpression {
  require(ids.length == centroids.length, "one id per centroid row")
  require(nprobe > 0, "nprobe must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) if centroids.nonEmpty =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(FloatType, _) =>
      TypeCheckResult.TypeCheckFailure("centroid_probes needs >= 1 centroid")
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"centroid_probes expects array<float>, got $other")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  private def cosineTo(x: ArrayData, cv: Array[Float]): Double = {
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
    if (nx == 0.0 || ny == 0.0) 0.0 else dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val m = math.min(nprobe, centroids.length)
    val topS = new Array[Double](m)
    val topI = new Array[Int](m)
    var filled = 0
    var c = 0
    while (c < centroids.length) {
      val s = cosineTo(x, centroids(c))
      val id = ids(c)
      // insertion position: better = higher score, ties smaller id —
      // compared through the NEGATED total order so NaN scores rank WORST,
      // exactly like the composed sort on (-score, cid) (Spark sorts NaN
      // greatest; negating a NaN keeps it NaN, so it lands last there too).
      var p = filled
      while (p > 0 && {
        val cmp = java.lang.Double.compare(-topS(p - 1), -s)
        cmp > 0 || (cmp == 0 && topI(p - 1) > id)
      }) p -= 1
      if (p < m) {
        val last = math.min(filled, m - 1)
        var q = last
        while (q > p) { topS(q) = topS(q - 1); topI(q) = topI(q - 1); q -= 1 }
        topS(p) = s; topI(p) = id
        if (filled < m) filled += 1
      }
      c += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(topI, filled))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val mat = ctx.addReferenceObj("centroids", centroids, "float[][]")
      val idArr = ctx.addReferenceObj("ids", ids, "int[]")
      val m = ctx.freshName("m")
      val topS = ctx.freshName("topS")
      val topI = ctx.freshName("topI")
      val filled = ctx.freshName("filled")
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
      val id = ctx.freshName("id")
      val p = ctx.freshName("p")
      val q = ctx.freshName("q")
      val last = ctx.freshName("last")
      s"""
      int $m = java.lang.Math.min($nprobe, $mat.length);
      double[] $topS = new double[$m];
      int[] $topI = new int[$m];
      int $filled = 0;
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
        int $id = $idArr[$c];
        int $p = $filled;
        while ($p > 0) {
          int cmp$p = java.lang.Double.compare(-$topS[$p - 1], -$s);
          if (cmp$p > 0 || (cmp$p == 0 && $topI[$p - 1] > $id)) $p--; else break;
        }
        if ($p < $m) {
          int $last = java.lang.Math.min($filled, $m - 1);
          for (int $q = $last; $q > $p; $q--) {
            $topS[$q] = $topS[$q - 1]; $topI[$q] = $topI[$q - 1];
          }
          $topS[$p] = $s; $topI[$p] = $id;
          if ($filled < $m) $filled++;
        }
      }
      ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(java.util.Arrays.copyOf($topI, $filled));
      """
    })

  override protected def withNewChildInternal(newChild: Expression): CentroidProbes =
    copy(child = newChild)
}

object CentroidProbes {
  /** Column-level entry point over (cid, vector) pairs. */
  def apply(vec: Column, centroids: Seq[(Int, Seq[Double])], nprobe: Int): Column = {
    val sorted = centroids.sortBy(_._1)
    Bridge.column(CentroidProbes(Bridge.expression(vec),
      sorted.map(_._2.map(_.toFloat).toArray).toArray,
      sorted.map(_._1).toArray, nprobe))
  }
}
