package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.graft.GraftSqlBridge
import org.apache.spark.sql.types._

/** Bounded top-k buffer: keeps the k best (ord, value) pairs. For minByK
  * (descending=false) "best" = smallest ord. Ties on ord are resolved by the
  * value's own ordering — including at the eviction boundary — so the kept
  * set is a pure function of the input multiset, independent of partitioning
  * and insertion order. */
final class TopKBuffer(val k: Int, val descending: Boolean,
    valueOrdering: Ordering[Any]) {
  // total order, best-first
  private[graft] val betterThan: Ordering[(Double, Any)] = new Ordering[(Double, Any)] {
    def compare(a: (Double, Any), b: (Double, Any)): Int = {
      val byOrd = java.lang.Double.compare(a._1, b._1)
      val o = if (descending) -byOrd else byOrd
      if (o != 0) o else valueOrdering.compare(a._2, b._2)
    }
  }
  // heap root = current worst element (the one evicted first)
  val heap: mutable.PriorityQueue[(Double, Any)] =
    mutable.PriorityQueue.empty(betterThan) // max-heap w.r.t. betterThan = worst at root

  def insert(ord: Double, value: Any): Unit = {
    if (heap.size < k) heap.enqueue((ord, value))
    else if (betterThan.compare((ord, value), heap.head) < 0) {
      heap.dequeue(); heap.enqueue((ord, value))
    }
  }
}

/** `min_by(value, ord, k)` / `max_by(value, ord, k)` — bounded top-k aggregate
  * returning the k values with smallest (largest) ord, ordered best-first.
  *
  * Mirrors the k-ary min_by/max_by the reference's queries rely on
  * (reference src/hnsw/hnsw_optimize_topk.cpp:80-91 and
  * src/hnsw/hnsw_index_macros.cpp:25-28); Spark's built-ins take no k.
  * Rows with NULL ord are ignored (DuckDB arg_min semantics). Ties on ord are
  * broken by the value's own ordering, making results deterministic under
  * any partitioning — important because partial aggregation (map-side
  * combine) is exactly why this beats a window-function formulation at
  * scale: the shuffle carries at most k rows per group, not the whole group.
  */
case class MinByK(
    valueExpr: Expression,
    ordExpr: Expression,
    kExpr: Expression,
    descending: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  override def prettyName: String = if (descending) "max_by_k" else "min_by_k"
  override def children: Seq[Expression] = Seq(valueExpr, ordExpr, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(valueExpr.dataType, containsNull = valueExpr.nullable)

  private lazy val k: Int = kExpr.eval(InternalRow.empty) match {
    case n: Number if n.intValue > 0 => n.intValue
    case other => throw new IllegalArgumentException(
      s"$prettyName: k must be a positive integer literal, got $other")
  }

  // Null-safe: interpreted orderings for atomic types NPE on null, and the
  // value CAN be null (ord non-null, value null). Nulls sort last.
  @transient private lazy val valueOrdering: Ordering[Any] = {
    val base = TypeUtils.getInterpretedOrdering(valueExpr.dataType)
    new Ordering[Any] {
      def compare(a: Any, b: Any): Int =
        if (a == null && b == null) 0
        else if (a == null) 1
        else if (b == null) -1
        else base.compare(a, b)
    }
  }

  override def checkInputDataTypes(): TypeCheckResult = ordExpr.dataType match {
    case _: NumericType if kExpr.foldable => TypeCheckResult.TypeCheckSuccess
    case _: NumericType =>
      TypeCheckResult.TypeCheckFailure(s"$prettyName: k must be a literal")
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: ordering argument must be numeric, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): TopKBuffer =
    new TopKBuffer(k, descending, valueOrdering)

  private def ordAsDouble(o: Any): Double = o match {
    case d: Double => d
    case f: Float => f.toDouble
    case n: Number => n.doubleValue()
    case d: org.apache.spark.sql.types.Decimal => d.toDouble
    case other => other.toString.toDouble
  }

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val ord = ordExpr.eval(input)
    if (ord != null) {
      val v = valueExpr.eval(input)
      buf.insert(ordAsDouble(ord), InternalRow.copyValue(v))
    }
    buf
  }

  override def merge(a: TopKBuffer, b: TopKBuffer): TopKBuffer = {
    b.heap.foreach { case (ord, v) => a.insert(ord, v) }
    a
  }

  override def eval(buf: TopKBuffer): Any = {
    val pairs = buf.heap.toArray
    val sorted = pairs.sortWith { case ((o1, v1), (o2, v2)) =>
      if (o1 != o2) { if (descending) o1 > o2 else o1 < o2 }
      else valueOrdering.lt(v1, v2)
    }
    new GenericArrayData(sorted.map(_._2))
  }

  // --- serialization: (ord double, value) rows via UnsafeProjection ---
  @transient private lazy val pairProjection =
    UnsafeProjection.create(Array[DataType](DoubleType, valueExpr.dataType))

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.heap.size)
    buf.heap.foreach { case (ord, v) =>
      val row = pairProjection.apply(InternalRow(ord, v))
      val bytes = row.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new TopKBuffer(k, descending, valueOrdering)
    val n = in.readInt()
    val row = new UnsafeRow(2)
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val arr = new Array[Byte](len)
      in.readFully(arr)
      row.pointTo(arr, len)
      val ord = row.getDouble(0)
      val v = InternalRow.copyValue(row.get(1, valueExpr.dataType))
      buf.insert(ord, v)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinByK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinByK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(valueExpr = newChildren(0), ordExpr = newChildren(1), kExpr = newChildren(2))
}

object MinByK {
  import org.apache.spark.sql.SparkSession

  private def agg(value: Column, ord: Column, k: Int, descending: Boolean): Column =
    GraftSqlBridge.column(
      MinByK(GraftSqlBridge.expression(value), GraftSqlBridge.expression(ord),
        Literal(k), descending).toAggregateExpression())

  /** k values with the smallest ord, best first. */
  def minByK(value: Column, ord: Column, k: Int): Column = agg(value, ord, k, descending = false)

  /** k values with the largest ord, best first. */
  def maxByK(value: Column, ord: Column, k: Int): Column = agg(value, ord, k, descending = true)

  /** SQL surface: `min_by_k(value, ord, k)` / `max_by_k(value, ord, k)`,
    * plus DuckDB-parity 3-arg dispatch on `min_by`/`max_by` themselves
    * (the k-ary form the reference's queries use,
    * reference test/sql/hnsw/hnsw_topk.test:16-26); the 2-arg form falls
    * back to Spark's native aggregates. */
  def registerAll(spark: SparkSession): Unit = {
    import org.apache.spark.sql.catalyst.expressions.aggregate.{MaxBy, MinBy}
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("min_by_k",
      es => MinByK(es(0), es(1), es(2), descending = false).toAggregateExpression(), "built-in")
    reg.createOrReplaceTempFunction("max_by_k",
      es => MinByK(es(0), es(1), es(2), descending = true).toAggregateExpression(), "built-in")
    reg.createOrReplaceTempFunction("min_by",
      es =>
        if (es.length == 3) MinByK(es(0), es(1), es(2), descending = false).toAggregateExpression()
        else MinBy(es(0), es(1)).toAggregateExpression(), "built-in")
    reg.createOrReplaceTempFunction("max_by",
      es =>
        if (es.length == 3) MinByK(es(0), es(1), es(2), descending = true).toAggregateExpression()
        else MaxBy(es(0), es(1)).toAggregateExpression(), "built-in")
  }
}
