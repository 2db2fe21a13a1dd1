package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.GraftSqlBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The whole PII annotate+redact projection in ONE native expression:
  * per-pattern match counts over the ORIGINAL text plus the sequentially
  * chained replacement (pattern i applied to the output of pattern i-1 —
  * exactly `Redaction.redact`'s fold), returned as a struct
  * (counts ARRAY<BIGINT> in `patterns` order, red STRING).
  *
  * The declarative formulation (3 × `RegexpMatchCount` + a 3-chained
  * `regexp_replace`) runs six independent expression evaluations per row:
  * six UTF8String→String conversions of the same document and six regex
  * passes. Here the document converts ONCE, the first pattern's count and
  * replacement share a single find loop (its count source and replace
  * source are both the original text), and later patterns pay one count
  * pass over the original plus one replace pass over the running result —
  * 5 passes, 1 conversion.
  *
  * Equivalence argument (differential-spec pinned): counts use the same
  * `Pattern.compile(p)` + `Matcher.find()` loop as [[RegexpMatchCount]];
  * replacement uses `Matcher.appendReplacement` with a literal token —
  * identical to Spark's RegExpReplace for tokens containing no `$`/`\`
  * (enforced below), applied in the same left-to-right pattern order as
  * the regexp_replace fold. */
case class RedactWithCounts(child: Expression,
    patterns: Seq[(String, String)])
    extends UnaryExpression with Serializable {
  require(patterns.nonEmpty, "need at least one (pattern, token)")
  require(patterns.forall { case (_, t) => !t.contains("$") && !t.contains("\\") },
    "replacement tokens must be literal (no $ or \\)")
  override def prettyName: String = "redact_with_counts"
  override def dataType: DataType = RedactWithCounts.schema
  override def nullIntolerant: Boolean = true

  @transient private lazy val compiled: Array[(Pattern, String)] =
    patterns.map { case (p, t) => (Pattern.compile(p), t) }.toArray

  def computeRow(text: UTF8String): InternalRow = {
    val s = text.toString
    val n = compiled.length
    val counts = new Array[Long](n)
    // pattern 0: count + replace share one find loop (both read `s`)
    // (java.lang.StringBuilder explicitly: Scala's StringBuilder would
    // auto-tuple the 3-arg append into append(Any) — spec-caught)
    var red: String = {
      val m = compiled(0)._1.matcher(s)
      val tok = compiled(0)._2
      var c = 0L
      val sb = new java.lang.StringBuilder(s.length)
      var last = 0
      while (m.find()) {
        c += 1
        sb.append(s, last, m.start()).append(tok)
        last = m.end()
      }
      counts(0) = c
      if (c == 0) s else sb.append(s, last, s.length).toString
    }
    var i = 1
    while (i < n) {
      val (p, tok) = compiled(i)
      // count over the ORIGINAL text (the contract of the count columns)
      val mc = p.matcher(s)
      var c = 0L
      while (mc.find()) c += 1
      counts(i) = c
      // replace over the running redacted text (the fold's contract)
      val mr = p.matcher(red)
      if (mr.find()) {
        val sb = new java.lang.StringBuilder(red.length)
        var last = 0
        do {
          sb.append(red, last, mr.start()).append(tok)
          last = mr.end()
        } while (mr.find())
        red = sb.append(red, last, red.length).toString
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](
      new GenericArrayData(counts.map(java.lang.Long.valueOf(_): Any)),
      UTF8String.fromString(red)))
  }

  override def nullSafeEval(input: Any): Any =
    computeRow(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("rwc", this,
      "graft.functions.RedactWithCounts")
    defineCodeGen(ctx, ev, c => s"$ref.computeRow($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RedactWithCounts {
  val schema: StructType = StructType(Seq(
    StructField("counts", ArrayType(LongType, containsNull = false),
      nullable = false),
    StructField("red", StringType, nullable = false)))

  def column(text: Column, patterns: Seq[(String, String)]): Column =
    GraftSqlBridge.column(
      RedactWithCounts(GraftSqlBridge.expression(text), patterns))
}
