package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.GraftSqlBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** All of [[graft.ops.TextAnalysis.repetitionSignals]]'s per-document counts
  * in ONE native pass over the token array: word count, distinct-word count,
  * top-word occurrence count, summed word length (chars), and distinct
  * adjacent-bigram count. The declarative formulation (array_sort +
  * run-length `aggregate`, `array_distinct`, `zip_with` over shifted slices)
  * computes identical values but runs through Spark's interpreted
  * higher-order-function path (ArrayAggregate/ZipWith are CodegenFallback,
  * re-boxing per element); this is one codegen'd JVM loop with a per-row
  * hash map, O(words) per doc.
  *
  * PRECONDITION: tokens contain no whitespace (true for any
  * `split(text, "\\s+")` input) — bigram distinctness is computed on word
  * PAIRS, which equals the declarative `concat(a, ' ', b)` string
  * distinctness exactly when no token can embed the separator.
  *
  * Output struct: (n_words BIGINT, n_distinct_words INT, top_word_cnt INT,
  * sum_word_len BIGINT, n_distinct_bigrams INT) — every field an exact
  * integer, so downstream ratio math is bit-identical to the declarative
  * plan and the SQL oracle. */
case class WordRepetitionStats(child: Expression)
    extends UnaryExpression with Serializable {
  override def prettyName: String = "word_repetition_stats"
  override def dataType: DataType = WordRepetitionStats.schema
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    WordRepetitionStats.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WordRepetitionStats.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordRepetitionStats {
  val schema: StructType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("n_distinct_words", IntegerType, nullable = false),
    StructField("top_word_cnt", IntegerType, nullable = false),
    StructField("sum_word_len", LongType, nullable = false),
    StructField("n_distinct_bigrams", IntegerType, nullable = false)))

  def compute(toks: ArrayData): InternalRow = {
    val n = toks.numElements()
    // word -> [count, insertion id]; UTF8String keys hash/compare by content,
    // and the map never outlives this row's evaluation, so views into the
    // unsafe row buffer are safe keys
    val counts = new java.util.HashMap[UTF8String, Array[Int]]()
    val ids = new Array[Int](n)
    var sumLen = 0L
    var top = 0
    var nextId = 0
    var i = 0
    while (i < n) {
      val w = toks.getUTF8String(i)
      var e = counts.get(w)
      if (e == null) { e = Array(0, nextId); nextId += 1; counts.put(w, e) }
      e(0) += 1
      if (e(0) > top) top = e(0)
      ids(i) = e(1)
      sumLen += w.numChars()
      i += 1
    }
    var distinctBigrams = 0
    if (n >= 2) {
      // pair key = (idA, idB) packed into one long — exact pair identity,
      // no per-bigram string concat
      val set = new java.util.HashSet[java.lang.Long]()
      var j = 0
      while (j < n - 1) {
        set.add((ids(j).toLong << 32) | (ids(j + 1).toLong & 0xffffffffL))
        j += 1
      }
      distinctBigrams = set.size
    }
    new GenericInternalRow(Array[Any](
      n.toLong, counts.size, top, sumLen, distinctBigrams))
  }

  def column(toks: Column): Column =
    GraftSqlBridge.column(WordRepetitionStats(GraftSqlBridge.expression(toks)))
}
