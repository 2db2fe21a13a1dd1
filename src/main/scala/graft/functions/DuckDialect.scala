package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** DuckDB-dialect scalar functions the reference's test suite leans on that
  * Spark lacks under these names (reference test/sql/hnsw/hnsw_topk.test:21,
  * hnsw_join_macro.test:29, hnsw_lateral_join_group.test:3). Registered by
  * [[graft.Graft.registerFunctions]]; all native codegen expressions — no
  * UDFs in any query path. */
object DuckDialect {

  /** Register the dialect surface (idempotent). `random()` is Spark-native
    * already; `len` here shadows Spark's string-only builtin with the
    * DuckDB polymorphic form (strings AND lists). */
  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    def r(name: String, f: Seq[Expression] => Expression): Unit =
      reg.createOrReplaceTempFunction(name, f, "built-in")
    r("len", es => DuckLen(es.head))
    r("list_sum", es => ListSum(es.head))
    // DuckDB's setseed(x) re-seeds ITS session RNG. Spark draws a fresh
    // seed per rand() expression instance, so there is no session RNG to
    // seed — accepted as a no-op (returns NULL, like DuckDB's void). Tests
    // that draw random data remain meaningful through materialize-once
    // tables and label differentials, never through cross-engine RNG parity.
    r("setseed", _ => Literal(null, DoubleType))
  }
}

/** DuckDB `len(x)`: length of a string OR a list, BIGINT. Dispatches on the
  * resolved child type, then lowers to Spark's native codegen'd
  * Length/Size. */
case class DuckLen(child: Expression) extends RuntimeReplaceable
    with UnaryLike[Expression] {
  override def prettyName: String = "len"
  override lazy val replacement: Expression = child.dataType match {
    case _: ArrayType => Cast(Size(child, legacySizeOfNull = false), LongType)
    case NullType => Literal(null, LongType) // len(NULL) is NULL, any type
    case _ => Cast(Length(child), LongType)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** DuckDB `list_sum(l)`: sum of the list's non-NULL elements; NULL for an
  * empty or all-NULL list (SQL aggregate semantics element-wise). Integral
  * element types sum as BIGINT, fractional as DOUBLE — one sequential pass,
  * codegen'd. */
case class ListSum(child: Expression) extends UnaryExpression {
  override def prettyName: String = "list_sum"

  private lazy val elemType: DataType = child.dataType match {
    case ArrayType(et, _) => et
    case _ => NullType
  }
  // integral element types sum as BIGINT; fractional AND decimal as DOUBLE
  // (a dialect convenience: DuckDB widens decimals, we go through double)
  private lazy val fractional: Boolean = elemType match {
    case FloatType | DoubleType | _: DecimalType => true
    case _ => false
  }

  override def dataType: DataType = if (fractional) DoubleType else LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: NumericType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"list_sum requires an array of numbers, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    ListSum.sum(input.asInstanceOf[ArrayData], elemType)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val et = ctx.addReferenceObj("listSumElemType", elemType,
        classOf[DataType].getName)
      s"""Object r = graft.functions.ListSum.sum($c, $et);
         |if (r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((java.lang.Number) r).${
           if (fractional) "doubleValue" else "longValue"}(); }
         |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ListSum {
  /** NULL elements skipped; null when nothing contributed. Boxed Long for
    * integral element types, boxed Double otherwise. */
  def sum(a: ArrayData, et: DataType): AnyRef = {
    val n = a.numElements()
    var i = 0
    var seen = false
    et match {
      case IntegerType | LongType | ShortType | ByteType =>
        var acc = 0L
        while (i < n) {
          if (!a.isNullAt(i)) {
            acc += (et match {
              case IntegerType => a.getInt(i).toLong
              case LongType => a.getLong(i)
              case ShortType => a.getShort(i).toLong
              case _ => a.getByte(i).toLong
            })
            seen = true
          }
          i += 1
        }
        if (seen) java.lang.Long.valueOf(acc) else null
      case _ =>
        var acc = 0.0
        while (i < n) {
          if (!a.isNullAt(i)) {
            acc += (et match {
              case FloatType => a.getFloat(i).toDouble
              case DoubleType => a.getDouble(i)
              case d: DecimalType =>
                a.getDecimal(i, d.precision, d.scale).toDouble
            })
            seen = true
          }
          i += 1
        }
        if (seen) java.lang.Double.valueOf(acc) else null
    }
  }
}
