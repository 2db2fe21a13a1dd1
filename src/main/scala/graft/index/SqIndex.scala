package graft.index

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GraftSqlBridge
import org.apache.spark.sql.types.{BinaryType, DataType}

/** Scalar-quantization (SQ8) ANN index — per-dimension affine int8
  * compression, the simplest member of the engine's quantization family
  * ([[PqIndex]] = codebook compression, [[IvfPqIndex]] = pruning + codes):
  *
  *   - TRAIN: one aggregation pass computes per-dimension min/max over the
  *     WHOLE table (no sampling needed — 2·dim scalar aggregates), giving
  *     each dimension an affine code ↔ value map
  *     `value ≈ min + code · (max − min)/255`.
  *   - ENCODE: every vector compresses 4× to one byte per dimension via a
  *     native codegen'd expression.
  *   - SEARCH (ADC): the query precomputes a dim×256 lookup table of
  *     per-dimension partial distances — exactly the asymmetric-distance
  *     shape PQ uses, so the scan reuses [[PqIndex.AdcTable]] and the
  *     [[PqAdcDistance]] expression verbatim (m = dim, k = 256). The best
  *     `k·refine` candidate ids are re-ranked EXACTLY against the source
  *     table (broadcast semi-join).
  *
  * `k·refine >= count` makes the result exact (the correctness-oracle
  * trick shared by HNSW ef >= N, IVF nProbe = nLists, PQ full refine).
  * Metrics: l2sq and ip (per-dimension additive); cosine callers
  * L2-normalize and use l2sq, as with PQ. */
object SqIndex {

  /** Per-dimension affine quantization ranges. Serializable: ships to
    * executors once per plan as an expression reference object. */
  final class Ranges(val mins: Array[Float], val scales: Array[Float])
      extends Serializable {
    def dim: Int = mins.length

    def encode(v: ArrayData): Array[Byte] = {
      val out = new Array[Byte](dim)
      var d = 0
      while (d < dim) {
        val s = scales(d)
        val c = if (s == 0f) 0
        else {
          val q = Math.round((v.getFloat(d) - mins(d)) / s)
          if (q < 0) 0 else if (q > 255) 255 else q
        }
        out(d) = c.toByte
        d += 1
      }
      out
    }

    /** Flattened dim×256 ADC table for one query (same layout as
      * [[PqIndex.AdcTable]] with k = 256). */
    def adcTable(q: Array[Float], metric: String): Array[Double] = {
      require(q.length == dim, s"query dim ${q.length} != index dim $dim")
      val table = new Array[Double](dim * 256)
      var d = 0
      while (d < dim) {
        var c = 0
        while (c < 256) {
          val deq = mins(d) + c * scales(d)
          table(d * 256 + c) =
            if (metric == "ip") -(q(d).toDouble * deq)
            else { val diff = q(d) - deq; diff.toDouble * diff }
          c += 1
        }
        d += 1
      }
      table
    }
  }

  case class SqEntry(
      name: String,
      sourceTable: String,
      idCol: String,
      vecCol: String,
      metric: String,
      path: String,
      ranges: Ranges,
      count: Long)

  private val registry = new ArtifactRegistry[SqEntry](_.path)
  def get(name: String): Option[SqEntry] = registry.get(name)
  def list: Iterable[SqEntry] = registry.values
  /** Re-register a checkpointed entry (restart restore path —
    * artifacts already live on shared storage). */
  private[index] def restoreEntry(e: SqEntry): Unit =
    registry.update(e.name, e)
  def drop(name: String): Boolean = registry.drop(name)
  def clear(): Unit = registry.clear()
  /** Forget entries without deleting artifacts (restart simulation). */
  def clearRegistryOnly(): Unit = registry.forgetAll()

  val CodesCol = "__sq_codes"

  /** Exact per-dimension min/max in ONE aggregation pass (2·dim scalar
    * aggregates — fine for embedding-scale dims; the pass itself is a
    * full-scan reduce, no shuffle of the data). */
  def train(df: DataFrame, vecCol: String): Ranges = {
    val src = df.select(col(vecCol)).where(col(vecCol).isNotNull)
    val firstRows = src.head(1)
    require(firstRows.nonEmpty, "cannot train SQ on an empty table")
    val dim = firstRows.head.getSeq[Float](0).length
    val aggs = (0 until dim).flatMap { d =>
      Seq(min(element_at(col(vecCol), d + 1)).as(s"mn_$d"),
        max(element_at(col(vecCol), d + 1)).as(s"mx_$d"))
    }
    val row = src.agg(aggs.head, aggs.tail: _*).head()
    val mins = new Array[Float](dim)
    val scales = new Array[Float](dim)
    var d = 0
    while (d < dim) {
      mins(d) = row.getFloat(2 * d)
      scales(d) = (row.getFloat(2 * d + 1) - mins(d)) / 255f
      d += 1
    }
    new Ranges(mins, scales)
  }

  /** Train + encode + write the code table (id, dim-byte codes). */
  def create(spark: SparkSession, name: String, table: String, idCol: String,
      vecCol: String, metric: String = "l2sq",
      baseDir: String = IndexCatalog.indexArtifactDir): SqEntry = {
    registry.requireFresh(name)
    require(metric == "l2sq" || metric == "ip",
      s"SQ supports l2sq and ip (per-dimension additive); for cosine, " +
        "L2-normalize the vectors and use l2sq")
    val df = spark.table(table)
    val ranges = train(df, vecCol)
    val path = s"$baseDir/$name-sq-${System.currentTimeMillis()}"
    df.where(col(vecCol).isNotNull)
      .select(col(idCol), SqEncode.column(col(vecCol), ranges).as(CodesCol))
      .write.parquet(path)
    registry.register(name, SqEntry(name, table, idCol, vecCol, metric, path,
      ranges, spark.read.parquet(path).count()))
  }

  /** ADC candidate scan over the code table + exact re-rank of the
    * `k·refine` best candidates (always broadcast-sized) against the
    * source table. `k·refine >= count` is exact. */
  def search(spark: SparkSession, name: String, q: Array[Float], k: Int,
      refine: Int = 8, tieBreak: Seq[String] = Nil): DataFrame = {
    val entry = registry.getOrThrow(name, "SQ")
    val nCand = math.min(k.toLong * refine, entry.count).toInt
    val adc = new PqIndex.AdcTable(entry.ranges.adcTable(q, entry.metric), 256)
    val cand = spark.read.parquet(entry.path)
      .withColumn("__adc", PqAdcDistance.column(col(CodesCol), adc))
      .orderBy(col("__adc"), col(entry.idCol))
      .limit(nCand)
      .select(col(entry.idCol))
    val src = spark.table(entry.sourceTable)
      .join(broadcast(cand), Seq(entry.idCol), "left_semi")
    graft.Graft.topK(src, entry.vecCol, q, k, entry.metric, tieBreak)
  }
}

/** Vector → per-dimension int8 codes. Native + codegen'd; the ranges ride
  * along as a plan reference object. */
case class SqEncode(child: Expression, ranges: SqIndex.Ranges)
    extends UnaryExpression with Serializable {
  override def prettyName: String = "sq_encode"
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    ranges.encode(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("sqRanges", ranges)
    defineCodeGen(ctx, ev, c => s"$ref.encode($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SqEncode {
  def column(vec: Column, ranges: SqIndex.Ranges): Column =
    GraftSqlBridge.column(SqEncode(GraftSqlBridge.expression(vec), ranges))
}
