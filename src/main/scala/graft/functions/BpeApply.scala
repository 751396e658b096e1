package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native BPE-apply expressions: tokenize a text column on single spaces,
  * split each word into character symbols, apply a CONSTANT merge table
  * in training order (greedy left-to-right fold per pass — the fused
  * symbol can seed the next position's left side, `Bpe.mergePass`
  * semantics, spec-pinned equal), and emit the flattened symbol stream
  * ([[BpeSymbols]]) or its vocabulary ids ([[BpeIds]]).
  *
  * Replaces the composed `transform(aggregate(...))` higher-order-function
  * form for the CORPUS pass: HOF lambdas evaluate interpreted per element
  * and the fold's `concat(slice(...))` copies the accumulator array per
  * symbol (quadratic per word) — measured 23 s for the sf0.1 corpus where
  * this expression takes well under a second. The merge table and
  * vocabulary are tokenizer CONFIG (plan constants), never data.
  */
object BpeApply {

  /** Greedy merge fold over one word — shared by eval and codegen. */
  def applyToWord(word: String, merges: Array[Array[String]],
      out: java.util.ArrayList[String]): Unit = {
    val n = word.length
    if (n == 0) return
    var syms = new Array[String](n)
    var i = 0
    while (i < n) { syms(i) = String.valueOf(word.charAt(i)); i += 1 }
    var len = n
    var m = 0
    while (m < merges.length) {
      val a = merges(m)(0); val b = merges(m)(1); val ab = merges(m)(2)
      var w = 0 // write cursor — the fold's accumulator, in place
      var r = 0
      while (r < len) {
        if (w > 0 && syms(w - 1) == a && syms(r) == b) syms(w - 1) = ab
        else { syms(w) = syms(r); w += 1 }
        r += 1
      }
      len = w
      m += 1
    }
    i = 0
    while (i < len) { out.add(syms(i)); i += 1 }
  }

  /** Whole-document symbol stream (space-tokenized; empty words drop).
    * Tokenization matches `split(trim(text), " ")` exactly: only the
    * SPACE character trims and splits (Java's `String.trim` also strips
    * tabs/newlines — a silent divergence from the SQL oracle's `trim`).
    * A non-null `marker` is appended as each word's terminal symbol
    * (Sennrich's `&lt;/w&gt;`), making the stream LOSSLESSLY decodable —
    * concatenate symbols, turn each marker into a space.
    */
  def symbolsOf(text: UTF8String, merges: Array[Array[String]],
      marker: String = null): java.util.ArrayList[String] = {
    val out = new java.util.ArrayList[String](64)
    val s = text.toString
    var start = 0
    val n = s.length
    var i = 0
    while (i <= n) {
      if (i == n || s.charAt(i) == ' ') {
        if (i > start) {
          applyToWord(s.substring(start, i), merges, out)
          if (marker != null) out.add(marker)
        }
        start = i + 1
      }
      i += 1
    }
    out
  }

  /** Entry point used by generated code for [[BpeSymbols]]. */
  def evalSymbols(text: UTF8String, merges: Array[Array[String]],
      marker: String): ArrayData = {
    val syms = symbolsOf(text, merges, marker)
    val arr = new Array[Any](syms.size)
    var i = 0
    while (i < syms.size) { arr(i) = UTF8String.fromString(syms.get(i)); i += 1 }
    new GenericArrayData(arr)
  }

  /** Entry point used by generated code for [[BpeIds]]. */
  def evalIds(text: UTF8String, merges: Array[Array[String]],
      vocab: java.util.HashMap[String, Integer]): ArrayData = {
    val syms = symbolsOf(text, merges, null)
    val arr = new Array[Any](syms.size)
    var i = 0
    while (i < syms.size) {
      val id = vocab.get(syms.get(i))
      if (id == null) throw new IllegalArgumentException(
        s"BPE symbol not in vocabulary: ${syms.get(i)}")
      arr(i) = id.intValue()
      i += 1
    }
    new GenericArrayData(arr)
  }

  private[functions] def mergeMatrix(merges: Seq[(String, String)]): Array[Array[String]] =
    merges.map { case (a, b) => Array(a, b, a + b) }.toArray
}

case class BpeSymbols(child: Expression, merges: Array[Array[String]],
    marker: String) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_symbols expects string, got $other")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(t: Any): Any =
    BpeApply.evalSymbols(t.asInstanceOf[UTF8String], merges, marker)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => {
      val m = ctx.addReferenceObj("merges", merges, "java.lang.String[][]")
      val mk = if (marker == null) "null"
        else ctx.addReferenceObj("marker", marker, "java.lang.String")
      s"${ev.value} = graft.functions.BpeApply.evalSymbols($t, $m, $mk);"
    })

  override protected def withNewChildInternal(newChild: Expression): BpeSymbols =
    copy(child = newChild)
}

object BpeSymbols {
  def apply(text: Column, merges: Seq[(String, String)]): Column =
    Bridge.column(BpeSymbols(Bridge.expression(text),
      BpeApply.mergeMatrix(merges), null))

  /** Marked variant: each word ends with `marker` — losslessly decodable. */
  def marked(text: Column, merges: Seq[(String, String)], marker: String): Column =
    Bridge.column(BpeSymbols(Bridge.expression(text),
      BpeApply.mergeMatrix(merges), marker))
}

case class BpeIds(child: Expression, merges: Array[Array[String]],
    vocab: java.util.HashMap[String, Integer])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_ids expects string, got $other")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(t: Any): Any =
    BpeApply.evalIds(t.asInstanceOf[UTF8String], merges, vocab)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => {
      val m = ctx.addReferenceObj("merges", merges, "java.lang.String[][]")
      val v = ctx.addReferenceObj("vocab", vocab, "java.util.HashMap")
      s"${ev.value} = graft.functions.BpeApply.evalIds($t, $m, $v);"
    })

  override protected def withNewChildInternal(newChild: Expression): BpeIds =
    copy(child = newChild)
}

object BpeIds {
  def apply(text: Column, merges: Seq[(String, String)],
      vocab: Map[String, Int]): Column = {
    val hm = new java.util.HashMap[String, Integer](vocab.size * 2)
    vocab.foreach { case (s, i) => hm.put(s, Integer.valueOf(i)) }
    Bridge.column(BpeIds(Bridge.expression(text), BpeApply.mergeMatrix(merges), hm))
  }
}
