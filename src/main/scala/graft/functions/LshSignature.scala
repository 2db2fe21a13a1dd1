package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.GraftSqlBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** All `nPlanes` sign-random-projection bits of one vector in ONE expression
  * evaluation — the LSH miners' signature stage.
  *
  * The column-algebra formulation (a `concat` of nPlanes CASE WHENs, each an
  * `array_inner_product` against a literal hyperplane) is oracle-replayable
  * but evaluates catastrophically once the auto geometry pushes plane counts
  * past ~40: the generated code blows the whole-stage budget and the
  * expression tree falls back to interpreted per-plane evaluation — measured
  * 0.35 ms/row (67 s of a 70 s q88 run at 200k rows, ProfileLsh). This
  * expression computes the same bits in a tight dim×planes double loop:
  * per-plane accumulation is the SAME sequential left fold over element
  * order, and plane weights are int/1024 (exact in float and double for
  * |h| ≤ 2^24), so every bit matches the SQL replay bit-for-bit. NULL
  * handling mirrors the CASE WHEN form: a NULL element makes every plane's
  * product NULL, which CASE'd to '0' — here an all-'0' signature; a NULL
  * array stays NULL. CodegenFallback: one eval call per row is already
  * ~3k flops of straight-line math, far off any hot path.
  *
  * `planes` is a Seq of Seq so two signature expressions over the same seeded
  * grid stay structurally equal (plan canonicalization); the flat double
  * matrix is derived once per executor. */
case class LshSignatureBits(child: Expression, planes: Seq[Seq[Int]])
  extends UnaryExpression with CodegenFallback with Serializable {

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"lsh_signature_bits expects array<float>/array<double>, got ${other.simpleString}")
    }

  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  // (h / 1024.0f).toDouble — the exact per-element weight the literal-array
  // formulation produced (float division by a power of two, |h| <= 1000)
  @transient private lazy val weights: Array[Array[Double]] =
    planes.map(_.map(h => (h / 1024.0f).toDouble).toArray).toArray

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    require(weights.length == 0 || weights(0).length == n,
      s"vector dimension $n != hyperplane dimension ${weights(0).length}")
    val isF = elemIsFloat
    val v = new Array[Double](n)
    var anyNull = false
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) anyNull = true
      else v(i) = if (isF) arr.getFloat(i).toDouble else arr.getDouble(i)
      i += 1
    }
    val out = new Array[Byte](weights.length)
    var p = 0
    while (p < weights.length) {
      if (anyNull) out(p) = '0'
      else {
        val w = weights(p)
        var acc = 0.0
        var j = 0
        while (j < n) { acc += v(j) * w(j); j += 1 }
        out(p) = if (acc > 0) '1' else '0'
      }
      p += 1
    }
    UTF8String.fromBytes(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object LshSignatureBits {
  def column(vec: Column, planes: Array[Array[Int]]): Column =
    GraftSqlBridge.column(LshSignatureBits(
      GraftSqlBridge.expression(vec), planes.map(_.toSeq).toSeq))
}
