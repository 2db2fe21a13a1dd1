package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.GraftSqlBridge
import org.apache.spark.sql.types._

/** Vector distance kernels as native Catalyst expressions (whole-stage
  * codegen friendly).
  *
  * Semantics mirror the reference surface (duckdb_vss README.md:55-61 and
  * usearch kernels, reference src/include/usearch/index_plugins.hpp:977-1053):
  *   - array_distance(a,b)                = sqrt(Σ (aᵢ-bᵢ)²)   (l2)
  *   - array_distance_sq(a,b)             = Σ (aᵢ-bᵢ)²          (l2sq, index metric)
  *   - array_inner_product(a,b)           = Σ aᵢ·bᵢ
  *   - array_negative_inner_product(a,b)  = -Σ aᵢ·bᵢ
  *   - array_cosine_similarity(a,b)       = a·b / (‖a‖‖b‖); both-zero → 1, one-zero → 0
  *   - array_cosine_distance(a,b)         = 1 - cosine_similarity
  *
  * All kernels accumulate sequentially (element order, left fold) in DOUBLE so
  * results are bit-reproducible across engines — the DuckDB oracle SQL uses the
  * same explicit formula. Inputs are array<float> or array<double>; a NULL
  * element or NULL array yields NULL; a dimension mismatch raises (mirrors the
  * reference binder check, reference src/hnsw/hnsw_index_plan.cpp:86-99).
  */
abstract class VectorBinaryExpression extends BinaryExpression with Serializable {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  // Always nullable: a NULL *element* inside a non-null array yields NULL,
  // so nullability can't be derived from the children alone.
  override def nullable: Boolean = true

  protected def elemIsFloat: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(FloatType, _))   => TypeCheckResult.TypeCheckSuccess
    case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
    case _ =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<float> or two array<double> arguments, " +
          s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  /** Scala kernel over the two arrays; return null for NULL elements. */
  protected def compute(a: ArrayData, b: ArrayData): Any

  protected final def dimCheck(a: ArrayData, b: ArrayData): Unit =
    if (a.numElements() != b.numElements()) {
      throw new IllegalArgumentException(
        s"$prettyName: dimension mismatch (${a.numElements()} vs ${b.numElements()})")
    }

  protected final def anyNullElement(a: ArrayData, b: ArrayData): Boolean = {
    var i = 0
    val n = a.numElements()
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return true
      i += 1
    }
    false
  }

  protected final def get(arr: ArrayData, i: Int): Double =
    if (elemIsFloat) arr.getFloat(i).toDouble else arr.getDouble(i)

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    dimCheck(a, b)
    if (anyNullElement(a, b)) null else compute(a, b)
  }

  /** Java source computing the result into `resVar` given arrays a/b; may set
    * `isNullVar` true. */
  protected def genKernel(ctx: CodegenContext, a: String, b: String,
      resVar: String, isNullVar: String): String

  protected final def genGet(arr: String, i: String): String =
    if (elemIsFloat) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  throw new IllegalArgumentException("$prettyName: dimension mismatch (" +
         |    $a.numElements() + " vs " + $b.numElements() + ")");
         |}
         |boolean ${ev.isNull}_e = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull}_e = true; break; }
         |}
         |if (${ev.isNull}_e) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${genKernel(ctx, a, b, ev.value.toString, ev.isNull.toString)}
         |}
       """.stripMargin
    })
  }
}

case class ArrayDistanceSq(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "array_distance_sq"
  override protected def compute(a: ArrayData, b: ArrayData): Any = {
    var acc = 0.0; var i = 0; val n = a.numElements()
    while (i < n) { val d = get(a, i) - get(b, i); acc += d * d; i += 1 }
    acc
  }
  override protected def genKernel(ctx: CodegenContext, a: String, b: String,
      res: String, isNull: String): String = {
    val acc = ctx.freshName("acc"); val i = ctx.freshName("i"); val d = ctx.freshName("d")
    s"""
       |double $acc = 0.0;
       |for (int $i = 0; $i < $a.numElements(); $i++) {
       |  double $d = ${genGet(a, i)} - ${genGet(b, i)};
       |  $acc += $d * $d;
       |}
       |$res = $acc;
     """.stripMargin
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

case class ArrayDistance(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "array_distance"
  override protected def compute(a: ArrayData, b: ArrayData): Any = {
    var acc = 0.0; var i = 0; val n = a.numElements()
    while (i < n) { val d = get(a, i) - get(b, i); acc += d * d; i += 1 }
    math.sqrt(acc)
  }
  override protected def genKernel(ctx: CodegenContext, a: String, b: String,
      res: String, isNull: String): String = {
    val acc = ctx.freshName("acc"); val i = ctx.freshName("i"); val d = ctx.freshName("d")
    s"""
       |double $acc = 0.0;
       |for (int $i = 0; $i < $a.numElements(); $i++) {
       |  double $d = ${genGet(a, i)} - ${genGet(b, i)};
       |  $acc += $d * $d;
       |}
       |$res = Math.sqrt($acc);
     """.stripMargin
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

case class ArrayInnerProduct(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "array_inner_product"
  override protected def compute(a: ArrayData, b: ArrayData): Any = {
    var acc = 0.0; var i = 0; val n = a.numElements()
    while (i < n) { acc += get(a, i) * get(b, i); i += 1 }
    acc
  }
  override protected def genKernel(ctx: CodegenContext, a: String, b: String,
      res: String, isNull: String): String = {
    val acc = ctx.freshName("acc"); val i = ctx.freshName("i")
    s"""
       |double $acc = 0.0;
       |for (int $i = 0; $i < $a.numElements(); $i++) {
       |  $acc += ${genGet(a, i)} * ${genGet(b, i)};
       |}
       |$res = $acc;
     """.stripMargin
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

case class ArrayNegativeInnerProduct(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  override def prettyName: String = "array_negative_inner_product"
  override protected def compute(a: ArrayData, b: ArrayData): Any = {
    var acc = 0.0; var i = 0; val n = a.numElements()
    while (i < n) { acc += get(a, i) * get(b, i); i += 1 }
    -acc
  }
  override protected def genKernel(ctx: CodegenContext, a: String, b: String,
      res: String, isNull: String): String = {
    val acc = ctx.freshName("acc"); val i = ctx.freshName("i")
    s"""
       |double $acc = 0.0;
       |for (int $i = 0; $i < $a.numElements(); $i++) {
       |  $acc += ${genGet(a, i)} * ${genGet(b, i)};
       |}
       |$res = -$acc;
     """.stripMargin
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Cosine kernels share the zero-vector edge rule of the reference
  * (reference src/include/usearch/index_plugins.hpp:1021-1025):
  * similarity(0,0)=1, similarity(0,x)=0. */
abstract class CosineBase extends VectorBinaryExpression {
  protected final def cosineSim(a: ArrayData, b: ArrayData): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0; val n = a.numElements()
    while (i < n) {
      val x = get(a, i); val y = get(b, i)
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    if (na == 0.0 && nb == 0.0) 1.0
    else if (na == 0.0 || nb == 0.0) 0.0
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }
  protected final def genCosine(ctx: CodegenContext, a: String, b: String,
      simVar: String): String = {
    val dot = ctx.freshName("dot"); val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
    val i = ctx.freshName("i"); val x = ctx.freshName("x"); val y = ctx.freshName("y")
    s"""
       |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
       |for (int $i = 0; $i < $a.numElements(); $i++) {
       |  double $x = ${genGet(a, i)};
       |  double $y = ${genGet(b, i)};
       |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
       |}
       |double $simVar;
       |if ($na == 0.0 && $nb == 0.0) { $simVar = 1.0; }
       |else if ($na == 0.0 || $nb == 0.0) { $simVar = 0.0; }
       |else { $simVar = $dot / (Math.sqrt($na) * Math.sqrt($nb)); }
     """.stripMargin
  }
}

case class ArrayCosineSimilarity(left: Expression, right: Expression) extends CosineBase {
  override def prettyName: String = "array_cosine_similarity"
  override protected def compute(a: ArrayData, b: ArrayData): Any = cosineSim(a, b)
  override protected def genKernel(ctx: CodegenContext, a: String, b: String,
      res: String, isNull: String): String = {
    val sim = ctx.freshName("sim")
    s"""${genCosine(ctx, a, b, sim)}
       |$res = $sim;
     """.stripMargin
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

case class ArrayCosineDistance(left: Expression, right: Expression) extends CosineBase {
  override def prettyName: String = "array_cosine_distance"
  override protected def compute(a: ArrayData, b: ArrayData): Any = 1.0 - cosineSim(a, b)
  override protected def genKernel(ctx: CodegenContext, a: String, b: String,
      res: String, isNull: String): String = {
    val sim = ctx.freshName("sim")
    s"""${genCosine(ctx, a, b, sim)}
       |$res = 1.0 - $sim;
     """.stripMargin
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Column-level API + SQL registration for the vector kernels. */
object vector {
  private def c(e: Expression): Column = GraftSqlBridge.column(e)
  private def x(col: Column): Expression = GraftSqlBridge.expression(col)

  def array_distance(a: Column, b: Column): Column = c(ArrayDistance(x(a), x(b)))
  def array_distance_sq(a: Column, b: Column): Column = c(ArrayDistanceSq(x(a), x(b)))
  def array_inner_product(a: Column, b: Column): Column = c(ArrayInnerProduct(x(a), x(b)))
  def array_negative_inner_product(a: Column, b: Column): Column =
    c(ArrayNegativeInnerProduct(x(a), x(b)))
  def array_cosine_similarity(a: Column, b: Column): Column = c(ArrayCosineSimilarity(x(a), x(b)))
  def array_cosine_distance(a: Column, b: Column): Column = c(ArrayCosineDistance(x(a), x(b)))

  /** Unit-L2 vector with DOUBLE elements — see [[ArrayL2Normalize]]. */
  def l2_normalize(a: Column): Column = c(ArrayL2Normalize(x(a)))

  /** Distance column for a named metric — the reference's metric map
    * (reference src/hnsw/hnsw_index.cpp:232-245): l2sq (default), cosine, ip. */
  def metricDistance(metric: String)(a: Column, b: Column): Column = metric match {
    case "l2sq"   => array_distance_sq(a, b)
    case "l2"     => array_distance(a, b)
    case "cosine" => array_cosine_distance(a, b)
    case "ip"     => array_negative_inner_product(a, b)
    case other    => throw new IllegalArgumentException(
      s"Unknown metric '$other'; expected one of l2sq, l2, cosine, ip")
  }

  val supportedMetrics: Set[String] = Set("l2sq", "l2", "cosine", "ip")

  /** Register all kernels as SQL functions on the session (idempotent). */
  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    def r(name: String, f: Seq[Expression] => Expression): Unit =
      reg.createOrReplaceTempFunction(name, f, "built-in")
    r("array_distance", es => ArrayDistance(es(0), es(1)))
    r("array_distance_sq", es => ArrayDistanceSq(es(0), es(1)))
    r("array_inner_product", es => ArrayInnerProduct(es(0), es(1)))
    r("array_negative_inner_product", es => ArrayNegativeInnerProduct(es(0), es(1)))
    r("array_cosine_similarity", es => ArrayCosineSimilarity(es(0), es(1)))
    r("array_cosine_distance", es => ArrayCosineDistance(es(0), es(1)))
    r("l2_normalize", es => ArrayL2Normalize(es(0)))
    // DuckDB's array constructor (reference README.md INSERT example) —
    // Spark's CreateArray with the reference's name
    r("array_value", es => CreateArray(es))
  }
}

/** float vector → unit-L2 DOUBLE vector in ONE pass (native + codegen'd —
  * a higher-order-function formulation would re-evaluate the O(dim) norm
  * inside the per-element lambda, O(dim²) per row). The norm is the same
  * sequential double fold the kernels use, so each element x/√(a·a)
  * replays bit-equal in the oracle's list_transform; the all-zero vector
  * normalizes to zeros (no NaN), mirroring the cosine zero-vector rule;
  * a NULL element yields NULL, like every kernel here. The bridge to the
  * quantized indexes' cosine guidance: l2_normalize + l2sq ranks like
  * cosine. */
case class ArrayL2Normalize(child: Expression)
    extends UnaryExpression with Serializable {
  override def prettyName: String = "l2_normalize"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"l2_normalize requires array<float>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    ArrayL2Normalize.normalize(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val code = nullSafeCodeGen(ctx, ev, c => {
      s"""${ev.value} = graft.functions.ArrayL2Normalize.normalize($c);
         |if (${ev.value} == null) { ${ev.isNull} = true; }""".stripMargin
    })
    code
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ArrayL2Normalize {
  /** Null when any element is null (kernel convention). */
  def normalize(a: ArrayData): ArrayData = {
    val n = a.numElements()
    var i = 0
    while (i < n) { if (a.isNullAt(i)) return null; i += 1 }
    var dot = 0.0
    i = 0
    while (i < n) { val x = a.getFloat(i).toDouble; dot += x * x; i += 1 }
    val out = new Array[Double](n)
    if (dot != 0.0) {
      val norm = java.lang.Math.sqrt(dot)
      i = 0
      while (i < n) { out(i) = a.getFloat(i) / norm; i += 1 }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}
