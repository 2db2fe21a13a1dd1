package graft.index

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GraftSqlBridge
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType}

/** Product-quantization (PQ) ANN index — the STORAGE-compression scale path
  * (Jégou, Douze, Schmid, "Product Quantization for Nearest Neighbor
  * Search", TPAMI 2011), complementing HNSW (graph, RAM-resident shards)
  * and IVF (partition pruning):
  *
  *   - TRAIN: the vector space is split into `m` subspaces; a seeded
  *     per-subspace k-means (Lloyd's over a bounded driver-side sample)
  *     learns `k` centroids per subspace.
  *   - ENCODE: every vector compresses to `m` BYTES (nearest sub-centroid id
  *     per subspace) via a native codegen'd expression — a 100 TB float
  *     corpus becomes ~100TB/(4·subdim) of codes; the code table is what
  *     scans at query time.
  *   - SEARCH (ADC — asymmetric distance computation): the query builds an
  *     m×k lookup table driver-side; each row's approximate distance is m
  *     table lookups (native expression, no float math per row). Top
  *     `k·refine` candidate ids go through an exact re-rank against the
  *     SOURCE table (broadcast semi-join on id — only the candidates'
  *     vectors are ever read).
  *
  * `refine` covering the whole table makes the result EXACT (candidates =
  * everything → the re-rank is brute force) — the correctness-oracle trick,
  * mirroring IVF's nProbe = nLists and HNSW's ef >= N. Metrics: l2sq and ip
  * (additive over subspaces). Cosine callers should L2-normalize vectors and
  * use l2sq (monotone in cosine distance); the constructor rejects cosine
  * with that guidance rather than silently mis-ranking. */
object PqIndex {

  /** [m][k][subdim] codebooks + the encode/ADC kernels. Serializable: ships
    * to executors once per plan as an expression reference object. */
  final class Codebooks(val books: Array[Array[Array[Float]]], val metric: String)
      extends Serializable {
    val m: Int = books.length
    val k: Int = books.head.length
    val subDim: Int = books.head.head.length
    def dim: Int = m * subDim

    /** Nearest-centroid id per subspace (l2 in the subspace — standard PQ
      * training/encode geometry for both supported metrics). */
    def encode(v: ArrayData): Array[Byte] = {
      val out = new Array[Byte](m)
      var s = 0
      while (s < m) {
        val base = s * subDim
        val book = books(s)
        var best = 0; var bestD = Double.MaxValue
        var j = 0
        while (j < book.length) {
          val c = book(j)
          var d = 0.0
          var t = 0
          while (t < subDim) {
            val diff = v.getFloat(base + t) - c(t)
            d += diff * diff
            t += 1
          }
          if (d < bestD) { bestD = d; best = j }
          j += 1
        }
        out(s) = best.toByte
        s += 1
      }
      out
    }

    /** Flattened m×k ADC lookup table for one query. */
    def adcTable(q: Array[Float]): Array[Double] = {
      require(q.length == dim, s"query dim ${q.length} != index dim $dim")
      val table = new Array[Double](m * k)
      var s = 0
      while (s < m) {
        val base = s * subDim
        val book = books(s)
        var j = 0
        while (j < book.length) {
          var acc = 0.0
          var t = 0
          if (metric == "ip") {
            while (t < subDim) { acc -= q(base + t) * book(j)(t); t += 1 }
          } else {
            while (t < subDim) {
              val d = q(base + t) - book(j)(t); acc += d * d; t += 1
            }
          }
          table(s * k + j) = acc
          j += 1
        }
        s += 1
      }
      table
    }
  }

  /** ADC lookup state for one query (reference object in the scan plan). */
  final class AdcTable(val table: Array[Double], val k: Int) extends Serializable {
    def dist(codes: Array[Byte]): Double = {
      var acc = 0.0
      var s = 0
      while (s < codes.length) {
        acc += table(s * k + (codes(s) & 0xff))
        s += 1
      }
      acc
    }
  }

  case class PqEntry(
      name: String,
      sourceTable: String,
      idCol: String,
      vecCol: String,
      metric: String,
      path: String,
      codebooks: Codebooks,
      count: Long)

  private val registry = new ArtifactRegistry[PqEntry](_.path)
  def get(name: String): Option[PqEntry] = registry.get(name)
  def list: Iterable[PqEntry] = registry.values
  /** Re-register a checkpointed entry (restart restore path —
    * artifacts already live on shared storage). */
  private[index] def restoreEntry(e: PqEntry): Unit =
    registry.update(e.name, e)
  def drop(name: String): Boolean = registry.drop(name)
  def clear(): Unit = registry.clear()
  /** Forget entries without deleting artifacts (restart simulation). */
  def clearRegistryOnly(): Unit = registry.forgetAll()

  val CodesCol = "__pq_codes"

  /** Seeded Lloyd's over the sample's s-th subspace slice. */
  private def lloyd(sample: Array[Array[Float]], k: Int, iters: Int,
      seed: Long): Array[Array[Float]] = {
    val subDim = sample.head.length
    val distinct = new scala.util.Random(seed)
      .shuffle(sample.map(_.toSeq).distinct.toSeq)
    val centroids = distinct.take(math.min(k, distinct.length)).map(_.toArray).toBuffer
    val kk = centroids.length
    var it = 0
    while (it < iters) {
      val sums = Array.fill(kk)(new Array[Double](subDim))
      val counts = new Array[Int](kk)
      sample.foreach { v =>
        var best = 0; var bestD = Double.MaxValue
        var i = 0
        while (i < kk) {
          var d = 0.0; var t = 0
          while (t < subDim) { val x = v(t) - centroids(i)(t); d += x * x; t += 1 }
          if (d < bestD) { best = i; bestD = d }
          i += 1
        }
        counts(best) += 1
        var j = 0
        while (j < subDim) { sums(best)(j) += v(j); j += 1 }
      }
      var i = 0
      while (i < kk) {
        if (counts(i) > 0) {
          var j = 0
          while (j < subDim) { centroids(i)(j) = (sums(i)(j) / counts(i)).toFloat; j += 1 }
        }
        i += 1
      }
      it += 1
    }
    centroids.toArray
  }

  /** Per-subspace codebooks from a deterministic bounded sample (xxhash64
    * order — layout-independent, same contract as IvfIndex.train). */
  def train(df: DataFrame, vecCol: String, m: Int, k: Int, metric: String,
      iters: Int = 10, sampleCap: Int = 10000, seed: Long = 42L): Codebooks = {
    require(m > 0 && k > 0 && k <= 256, s"need 0 < k <= 256 (byte codes), 0 < m; got m=$m k=$k")
    require(metric == "l2sq" || metric == "ip",
      s"PQ supports l2sq and ip (additive over subspaces); for cosine, " +
        "L2-normalize the vectors and use l2sq")
    val rows = df.select(col(vecCol)).where(col(vecCol).isNotNull)
      .orderBy(xxhash64(col(vecCol)))
      .limit(sampleCap).collect()
    require(rows.nonEmpty, "cannot train PQ on an empty table")
    val sample = rows.map(_.getSeq[Float](0).toArray)
    val dim = sample.head.length
    require(dim % m == 0, s"dim $dim not divisible by m=$m subspaces")
    val subDim = dim / m
    val books = Array.tabulate(m) { s =>
      val slice = sample.map(v => java.util.Arrays.copyOfRange(v, s * subDim, (s + 1) * subDim))
      lloyd(slice, k, iters, seed + s)
    }
    // lloyd caps each subspace at its own distinct-sample count, so the
    // books can be RAGGED — but the m×k ADC table is strided on a single k.
    // Pad every book to the widest with copies of its last centroid: a
    // padded duplicate ties (never strictly beats) the original in encode's
    // strict-min, so padded code ids are never emitted, and the ADC table
    // entries they produce are merely unused.
    val kk = books.map(_.length).max
    val padded = books.map(b =>
      if (b.length == kk) b else b ++ Array.fill(kk - b.length)(b.last))
    new Codebooks(padded, metric)
  }

  /** Train + encode + write the code table (id, m-byte codes). */
  def create(spark: SparkSession, name: String, table: String, idCol: String,
      vecCol: String, m: Int = 8, k: Int = 256, metric: String = "l2sq",
      iters: Int = 10, seed: Long = 42L,
      baseDir: String = IndexCatalog.indexArtifactDir): PqEntry = {
    registry.requireFresh(name)
    val df = spark.table(table)
    val cb = train(df, vecCol, m, k, metric, iters, seed = seed)
    val path = s"$baseDir/$name-pq-${System.currentTimeMillis()}"
    val src = df.where(col(vecCol).isNotNull)
    src.select(col(idCol), PqEncode.column(col(vecCol), cb).as(CodesCol))
      .write.parquet(path)
    val entry = PqEntry(name, table, idCol, vecCol, metric, path, cb,
      spark.read.parquet(path).count())
    registry.register(name, entry)
  }

  /** ADC candidate generation over the code table + exact re-rank of the
    * `k·refine` best candidates against the source table. `k·refine >=
    * count` is exact. The candidate set is k·refine ids — always broadcast
    * size — so re-rank reads only those source rows. */
  def search(spark: SparkSession, name: String, q: Array[Float], k: Int,
      refine: Int = 8, tieBreak: Seq[String] = Nil): DataFrame = {
    val entry = registry.getOrThrow(name, "PQ")
    val nCand = math.min(k.toLong * refine, entry.count).toInt
    val adc = new AdcTable(entry.codebooks.adcTable(q), entry.codebooks.k)
    val cand = spark.read.parquet(entry.path)
      .withColumn("__adc", PqAdcDistance.column(col(PqIndex.CodesCol), adc))
      .orderBy(col("__adc"), col(entry.idCol))
      .limit(nCand)
      .select(col(entry.idCol))
    val src = spark.table(entry.sourceTable)
      .join(broadcast(cand), Seq(entry.idCol), "left_semi")
    graft.Graft.topK(src, entry.vecCol, q, k, entry.metric, tieBreak)
  }
}

/** Vector → m-byte PQ code. Native + codegen'd: one JVM loop per row, the
  * codebooks ride along as a plan reference object (serialized once). */
case class PqEncode(child: Expression, codebooks: PqIndex.Codebooks)
    extends UnaryExpression with Serializable {
  override def prettyName: String = "pq_encode"
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    codebooks.encode(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCodebooks", codebooks)
    defineCodeGen(ctx, ev, c => s"$ref.encode($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqEncode {
  def column(vec: Column, cb: PqIndex.Codebooks): Column =
    GraftSqlBridge.column(PqEncode(GraftSqlBridge.expression(vec), cb))
}

/** PQ codes → approximate distance via the query's ADC lookup table: m array
  * reads per row, no float math. */
case class PqAdcDistance(child: Expression, adc: PqIndex.AdcTable)
    extends UnaryExpression with Serializable {
  override def prettyName: String = "pq_adc_distance"
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    adc.dist(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqAdcTable", adc)
    defineCodeGen(ctx, ev, c => s"$ref.dist($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqAdcDistance {
  def column(codes: Column, adc: PqIndex.AdcTable): Column =
    GraftSqlBridge.column(PqAdcDistance(GraftSqlBridge.expression(codes), adc))
}
