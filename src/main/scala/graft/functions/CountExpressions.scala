package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.GraftSqlBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Count of non-overlapping regex matches as a NATIVE expression — the
  * count-only form of `size(regexp_extract_all(text, p, 0))`. Spark's
  * RegExpExtractAll runs the same `Matcher.find()` loop but materializes
  * every match as a UTF8String in an array that the caller immediately
  * reduces to its size; for count consumers (BPE token counts, PII tallies,
  * char-class ratios) the array is pure allocation. Same Pattern compile
  * (no flags), same find() loop ⇒ identical counts by construction. */
case class RegexpMatchCount(child: Expression, pattern: String)
    extends UnaryExpression with Serializable {
  override def prettyName: String = "regexp_match_count"
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  @transient private lazy val compiled: Pattern = Pattern.compile(pattern)

  override def nullSafeEval(input: Any): Any =
    RegexpMatchCount.count(input.asInstanceOf[UTF8String], compiled)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("rmcPattern", pattern, "java.lang.String")
    val pat = ctx.addMutableState("java.util.regex.Pattern", "rmcCompiled",
      v => s"$v = java.util.regex.Pattern.compile($ref);")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.RegexpMatchCount.count($c, $pat)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RegexpMatchCount {
  def count(text: UTF8String, p: Pattern): Long = {
    val m = p.matcher(text.toString)
    var n = 0L
    while (m.find()) n += 1
    n
  }

  def column(text: Column, pattern: String): Column =
    GraftSqlBridge.column(RegexpMatchCount(GraftSqlBridge.expression(text), pattern))
}

/** Count of non-overlapping literal-substring occurrences as a NATIVE
  * expression — the count-only form of the replace-length idiom
  * `(length(text) - length(replace(text, needle, ''))) / length(needle)`,
  * which allocates a full copy of the document per needle (the language-ID
  * marker scan runs 20 of them per doc). A left-to-right indexOf walk
  * stepping by the needle length counts exactly the occurrences replace
  * would have consumed, with zero allocation. */
case class SubstringCount(child: Expression, needle: String)
    extends UnaryExpression with Serializable {
  require(needle.nonEmpty, "needle must be non-empty")
  override def prettyName: String = "substring_count"
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  @transient private lazy val needleU: UTF8String = UTF8String.fromString(needle)

  override def nullSafeEval(input: Any): Any =
    SubstringCount.count(input.asInstanceOf[UTF8String], needleU)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("scNeedle", needle, "java.lang.String")
    val nv = ctx.addMutableState("org.apache.spark.unsafe.types.UTF8String",
      "scNeedleU",
      v => s"$v = org.apache.spark.unsafe.types.UTF8String.fromString($ref);")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SubstringCount.count($c, $nv)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SubstringCount {
  /** Non-overlapping left-to-right occurrence count — identical to what
    * `replace(text, needle, "")` consumes. UTF8String.find walks bytes; a
    * byte-level match of a valid UTF-8 needle is always a char-level match
    * (UTF-8 self-synchronization), so byte search equals string search. */
  def count(text: UTF8String, needle: UTF8String): Long = {
    val nb = needle.numBytes()
    var n = 0L
    var from = 0
    var i = text.find(needle, from)
    while (i >= 0) {
      n += 1
      from = i + nb
      i = text.find(needle, from)
    }
    n
  }

  def column(text: Column, needle: String): Column =
    GraftSqlBridge.column(SubstringCount(GraftSqlBridge.expression(text), needle))
}
