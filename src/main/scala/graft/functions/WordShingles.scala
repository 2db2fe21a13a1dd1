package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.GraftSqlBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles of a token array as a NATIVE expression —
  * one JVM loop per document. The declarative formulation
  * (`transform(sequence(...), i => concat_ws(" ", slice(words, i+1, n)))` +
  * `filter` + `array_distinct`) computes the identical array but runs the
  * gram construction through Spark's interpreted higher-order-function path,
  * allocating a slice array per gram — measured as the dominant cost of
  * both shingle-family artifact builds (16.4 s of build_dedup_sigs' ~20 s
  * at the 100x cut, ProfileSigs).
  *
  * Exact-parity contract with the declarative form (the SQL oracles replay
  * it): grams join n consecutive tokens with a single space (empty tokens
  * kept, exactly concat_ws over never-null split output), texts shorter
  * than n words yield an empty array, zero-length grams are dropped, and
  * distinctness keeps FIRST occurrence order (array_distinct semantics). */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with Serializable {
  require(n >= 1, "shingle length must be positive")
  override def prettyName: String = "word_shingles"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    WordShingles.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WordShingles.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordShingles {
  private val Sep = UTF8String.fromString(" ")

  def compute(toks: ArrayData, n: Int): ArrayData = {
    val sz = toks.numElements()
    if (sz < n) return new GenericArrayData(Array.empty[Any])
    // LinkedHashSet == array_distinct's first-occurrence order
    val seen = new java.util.LinkedHashSet[UTF8String]()
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i <= sz - n) {
      var j = 0
      while (j < n) { parts(j) = toks.getUTF8String(i + j); j += 1 }
      // concatWs allocates a fresh buffer, so the gram owns its bytes
      val g = UTF8String.concatWs(Sep, parts: _*)
      if (g.numBytes() > 0) seen.add(g)
      i += 1
    }
    new GenericArrayData(seen.toArray(Array.empty[AnyRef]))
  }

  def column(toks: Column, n: Int): Column =
    GraftSqlBridge.column(WordShingles(GraftSqlBridge.expression(toks), n))
}
