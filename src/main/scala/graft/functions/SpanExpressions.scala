package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.GraftSqlBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit hash of every n-token window of a token array, as a NATIVE
  * expression — the hot loop of exact-substring span removal. The
  * declarative formulation (`transform(sequence(1, nWin), i =>
  * md5(concat_ws(" ", slice(toks, i, n))))`) runs through the interpreted
  * higher-order-function path with a slice allocation per window —
  * measured 6.1 s of the span-removal corpus pass at the 100x cut
  * (ProfileSigs). The hash is INTERNAL to the op (never output), so it
  * carries xxhash64 longs instead of md5 hex strings: the hot-window
  * aggregate shuffles 8-byte keys instead of 32-char strings — the same
  * 64-bit-key trade [[graft.ops.Dedup.hashedShingles]] documents (collision
  * odds ~windows²/2⁶⁴). Window j (0-based) covers tokens [j, j+n-1]; texts
  * shorter than n tokens yield an empty array. */
case class GramHashes(child: Expression, n: Int)
    extends UnaryExpression with Serializable {
  require(n >= 1, "window length must be positive")
  override def prettyName: String = "gram_hashes"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    GramHashes.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.GramHashes.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GramHashes {
  private val Sep = UTF8String.fromString(" ")

  def compute(toks: ArrayData, n: Int): ArrayData = {
    val sz = toks.numElements()
    if (sz < n) return new GenericArrayData(Array.empty[Long])
    val out = new Array[Long](sz - n + 1)
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i <= sz - n) {
      var j = 0
      while (j < n) { parts(j) = toks.getUTF8String(i + j); j += 1 }
      // same 64-bit hash family as Spark's xxhash64 expression (seed 42)
      val w = UTF8String.concatWs(Sep, parts: _*)
      out(i) = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(w.getBaseObject, w.getBaseOffset, w.numBytes(), 42L)
      i += 1
    }
    new GenericArrayData(out)
  }

  def column(toks: Column, n: Int): Column =
    GraftSqlBridge.column(GramHashes(GraftSqlBridge.expression(toks), n))
}

/** Space-rejoin of a token array with the tokens at `positions` (sorted
  * ascending, 0-based) removed — the rebuild step of span removal as one
  * NATIVE two-pointer loop per document, replacing the exploded-token
  * anti-join + collect_list + interpreted-fold re-aggregation of the whole
  * corpus (the covered-position set is duplicate-mass-sized; the token
  * stream is the corpus). Returns the cleaned text; an empty positions
  * array returns the space-joined input. */
case class RemoveTokensAt(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {
  override def prettyName: String = "remove_tokens_at"
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(toks: Any, pos: Any): Any =
    RemoveTokensAt.compute(toks.asInstanceOf[ArrayData], pos.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (t, p) => s"graft.functions.RemoveTokensAt.compute($t, $p)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object RemoveTokensAt {
  private val Sep = UTF8String.fromString(" ")

  def compute(toks: ArrayData, pos: ArrayData): UTF8String = {
    val sz = toks.numElements()
    val np = pos.numElements()
    val kept = new Array[UTF8String](sz)
    var nk = 0
    var k = 0
    var i = 0
    while (i < sz) {
      while (k < np && pos.getInt(k) < i) k += 1
      if (k < np && pos.getInt(k) == i) k += 1
      else { kept(nk) = toks.getUTF8String(i); nk += 1 }
      i += 1
    }
    UTF8String.concatWs(Sep, java.util.Arrays.copyOf(kept, nk): _*)
  }

  def column(toks: Column, positions: Column): Column =
    GraftSqlBridge.column(RemoveTokensAt(
      GraftSqlBridge.expression(toks), GraftSqlBridge.expression(positions)))
}
