package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Native Catalyst expressions for product quantization (the IVF-PQ design
  * of billion-scale ANN): [[PqEncode]] compresses an `array<float>` vector
  * to `m` one-byte sub-centroid codes (a 128-dim float vector becomes 16
  * bytes — 32x), and [[PqAdcDot]] scores a code against a query's
  * asymmetric-distance lookup table with `m` table reads per row — the scan
  * over compressed codes never touches the original vectors.
  *
  * Both run inside whole-stage codegen via static helpers (one method call
  * per row, never k inlined sub-expressions — the JIT-limit lesson of
  * CentroidArgmax applies doubly at ksub=256).
  */
case class PqEncode(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression {
  require(codebooks.nonEmpty, "empty codebook set")
  require(codebooks.forall(cb => cb.nonEmpty && cb.length <= 256),
    "each subspace codebook holds 1..256 sub-centroids (one byte per code)")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_encode expects array<float>, got $other")
  }

  override def dataType: DataType = BinaryType

  override def nullSafeEval(a: Any): Any =
    PqEncode.encode(a.asInstanceOf[ArrayData], codebooks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cb = ctx.addReferenceObj("pqCodebooks", codebooks, "double[][][]")
      s"${ev.value} = graft.functions.PqEncode.encode($a, $cb);"
    })

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

object PqEncode {
  /** Nearest sub-centroid (squared L2) per subspace of the L2-NORMALIZED
    * vector (codebooks train on normalized samples — PQ here quantizes
    * direction, so ADC sums approximate cosine); ties keep the LOWER code.
    * Normalization happens HERE, inside the codegen'd loop — a composed
    * `transform`/`aggregate` normalization would run interpreted per row on
    * the one corpus-wide pass this index costs. Subspace j covers elements
    * [j*dsub, (j+1)*dsub); a vector shorter than the trained dimensionality
    * zero-pads, and an all-zero vector encodes unscaled (never throws —
    * encode must total-function over dirty data).
    */
  def encode(vec: ArrayData, codebooks: Array[Array[Array[Double]]]): Array[Byte] = {
    val n = vec.numElements()
    var ss = 0.0
    var t = 0
    while (t < n) { val x = vec.getFloat(t).toDouble; ss += x * x; t += 1 }
    val inv = if (ss == 0.0) 1.0 else 1.0 / math.sqrt(ss)
    val out = new Array[Byte](codebooks.length)
    var j = 0
    var off = 0
    while (j < codebooks.length) {
      val cb = codebooks(j)
      val dsub = cb(0).length
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < cb.length) {
        val cent = cb(c)
        var d = 0.0
        var i = 0
        while (i < dsub) {
          val v = if (off + i < n) vec.getFloat(off + i).toDouble * inv else 0.0
          val diff = v - cent(i)
          d += diff * diff
          i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(j) = best.toByte
      off += dsub
      j += 1
    }
    out
  }

  def apply(vec: Column, codebooks: Array[Array[Array[Double]]]): Column =
    Bridge.column(PqEncode(Bridge.expression(vec), codebooks))
}

/** Asymmetric-distance score: `sum_j lut(j)(code(j))`. With `lut(j)(c)` the
  * inner product of the query's j-th subvector with sub-centroid c, the sum
  * approximates `dot(query, vector)` — on unit-normalized inputs, cosine.
  */
case class PqAdcDot(child: Expression, lut: Array[Array[Double]])
    extends UnaryExpression {
  require(lut.nonEmpty, "empty lookup table")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_adc expects binary pq codes, got $other")
  }

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any): Any =
    PqAdcDot.score(a.asInstanceOf[Array[Byte]], lut)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val l = ctx.addReferenceObj("pqLut", lut, "double[][]")
      s"${ev.value} = graft.functions.PqAdcDot.score($a, $l);"
    })

  override protected def withNewChildInternal(newChild: Expression): PqAdcDot =
    copy(child = newChild)
}

object PqAdcDot {
  /** A code from a DIFFERENT (shorter) model scores only its own bytes; a
    * longer one ignores the tail — total function, like encode.
    */
  def score(code: Array[Byte], lut: Array[Array[Double]]): Double = {
    var s = 0.0
    var j = 0
    val m = math.min(code.length, lut.length)
    while (j < m) {
      val c = code(j) & 0xFF
      val row = lut(j)
      if (c < row.length) s += row(c)
      j += 1
    }
    s
  }

  def apply(code: Column, lut: Array[Array[Double]]): Column =
    Bridge.column(PqAdcDot(Bridge.expression(code), lut))
}
