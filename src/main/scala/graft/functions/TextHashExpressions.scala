package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.GraftSqlBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Rolling-hash document fingerprint as a NATIVE expression: the k-char-gram
  * polynomial min-hash evaluated in one tight JVM loop. The column-algebra
  * formulation (transform + aggregate lambdas) computes the identical value
  * but runs through Spark's interpreted higher-order-function path — measured
  * 50× slower at sf0.1. Math mirrors the DuckDB oracle exactly: per window
  * `fold(acc*B + codepoint) mod M`, positions counted in characters,
  * positions past the end contributing 0 (ascii('') = 0 in both engines). */
case class RollingMinHash(child: Expression, k: Int)
    extends UnaryExpression with Serializable {
  require(k >= 1, "window size must be positive")
  override def prettyName: String = "rolling_min_hash"
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    RollingMinHash.compute(input.asInstanceOf[UTF8String].toString, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.RollingMinHash.compute($c.toString(), $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingMinHash {
  val B = 257L
  val M = 1000000007L

  /** Min over all k-char windows of the polynomial hash; windows start at
    * every character position 1..max(len-k+1, 1). True O(n) rolling update:
    * drop the leading char's B^(k-1) term, shift, append the next char. */
  def compute(s: String, k: Int): Long = {
    val cps = s.codePoints().toArray
    val n = cps.length
    if (n <= k) { // single (zero-padded) window
      var acc = 0L
      var j = 0
      while (j < k) {
        acc = (acc * B + (if (j < n) cps(j).toLong else 0L)) % M
        j += 1
      }
      return acc
    }
    var bk = 1L // B^(k-1) mod M
    var t = 0
    while (t < k - 1) { bk = bk * B % M; t += 1 }
    var acc = 0L
    var j = 0
    while (j < k) { acc = (acc * B + cps(j)) % M; j += 1 }
    var minH = acc
    var i = 1
    while (i <= n - k) {
      acc = ((acc - cps(i - 1) * bk % M + M) % M * B + cps(i + k - 1)) % M
      if (acc < minH) minH = acc
      i += 1
    }
    minH
  }

  def column(text: Column, k: Int): Column =
    GraftSqlBridge.column(RollingMinHash(GraftSqlBridge.expression(text), k))
}

/** Exact-phrase occurrence count over a token array as a NATIVE expression:
  * one tight JVM loop over (start, phrase-position) pairs. The declarative
  * formulation ([[graft.ops.TextSearch.phraseCountTokens]]: filter over a
  * sequence of start offsets) computes the identical value but runs through
  * Spark's interpreted higher-order-function path (ArrayFilter is
  * CodegenFallback) — measured ~10× slower at sf0.1. Counts OVERLAPPING
  * occurrences (every start offset), matching the oracle's list_filter. */
case class TokenPhraseCount(child: Expression, phrase: Seq[String])
    extends UnaryExpression with Serializable {
  require(phrase.nonEmpty, "phrase must have at least one term")
  override def prettyName: String = "token_phrase_count"
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  @transient private lazy val needles: Array[UTF8String] =
    phrase.map(UTF8String.fromString).toArray

  override def nullSafeEval(input: Any): Any =
    TokenPhraseCount.count(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], needles)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("phraseNeedles", phrase.toArray,
      "java.lang.String[]")
    val needlesVar = ctx.addMutableState("org.apache.spark.unsafe.types.UTF8String[]",
      "tpcNeedles",
      v => s"""$v = graft.functions.TokenPhraseCount.toNeedles($ref);""")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TokenPhraseCount.count($c, $needlesVar)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenPhraseCount {
  def toNeedles(phrase: Array[String]): Array[UTF8String] =
    phrase.map(UTF8String.fromString)

  def count(toks: org.apache.spark.sql.catalyst.util.ArrayData,
      needles: Array[UTF8String]): Long = {
    val n = toks.numElements()
    val m = needles.length
    var hits = 0L
    var i = 0
    while (i <= n - m) {
      var j = 0
      var ok = true
      while (ok && j < m) {
        val t = toks.getUTF8String(i + j)
        if (t == null || !t.equals(needles(j))) ok = false
        j += 1
      }
      if (ok) hits += 1
      i += 1
    }
    hits
  }

  def column(toks: Column, phrase: Seq[String]): Column =
    GraftSqlBridge.column(TokenPhraseCount(GraftSqlBridge.expression(toks), phrase))
}
