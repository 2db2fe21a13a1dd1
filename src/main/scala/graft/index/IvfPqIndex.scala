package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.vector

/** IVF-PQ hybrid — the two scale mechanisms composed, as in billion-scale
  * ANN systems (Jégou et al. 2011 §V; FAISS's IVFPQ layout): coarse k-means
  * lists stored as parquet partitions (IVF — file-listing-time pruning) hold
  * m-byte PQ codes instead of vectors (PQ — the pruned scan reads bytes, not
  * floats). A query probes `nProbe` lists, ADC-scores only those partitions'
  * codes, and exactly re-ranks the top `k·refine` candidates against the
  * source table (broadcast semi-join on id).
  *
  * At 100 TB the scan cost is (nProbe/nLists) × (m/4d) of the raw corpus —
  * the two factors multiply. `nProbe = nLists` AND `refine` covering the
  * table is exact (both approximations disabled) — the oracle contract.
  *
  * Codebooks quantize RAW vectors, not per-list residuals: residual encoding
  * buys recall at equal m but needs a per-row centroid lookup inside the
  * encode/ADC kernels; with the exact re-rank step the recall difference is
  * recovered by a slightly larger `refine`, so the simpler geometry wins. */
object IvfPqIndex {

  case class IvfPqEntry(
      name: String,
      sourceTable: String,
      idCol: String,
      vecCol: String,
      metric: String,
      path: String,
      centroids: Array[Array[Float]],
      codebooks: PqIndex.Codebooks,
      count: Long)

  private val registry = new ArtifactRegistry[IvfPqEntry](_.path)
  def get(name: String): Option[IvfPqEntry] = registry.get(name)
  def list: Iterable[IvfPqEntry] = registry.values
  /** Re-register a checkpointed entry (restart restore path —
    * artifacts already live on shared storage). */
  private[index] def restoreEntry(e: IvfPqEntry): Unit =
    registry.update(e.name, e)
  def drop(name: String): Boolean = registry.drop(name)
  def clear(): Unit = registry.clear()
  /** Forget entries without deleting artifacts (restart simulation). */
  def clearRegistryOnly(): Unit = registry.forgetAll()

  val ListCol = "__ivfpq_list"

  /** Train both quantizers off one deterministic sample pass, assign + encode
    * with codegen'd expressions, write codes partitioned by list. */
  def create(spark: SparkSession, name: String, table: String, idCol: String,
      vecCol: String, nLists: Int, m: Int = 8, k: Int = 256,
      metric: String = "l2sq", iters: Int = 10, seed: Long = 42L,
      baseDir: String = IndexCatalog.indexArtifactDir): IvfPqEntry = {
    registry.requireFresh(name)
    val df = spark.table(table)
    val centroids = IvfIndex.train(df, vecCol, nLists, metric, iters, seed = seed)
    val cb = PqIndex.train(df, vecCol, m, k, metric, iters, seed = seed)
    val path = s"$baseDir/$name-ivfpq-${System.currentTimeMillis()}"
    val assign = IvfIndex.assignExpr(vecCol, centroids, metric)
    df.where(col(vecCol).isNotNull)
      .select(col(idCol), assign.as(ListCol),
        PqEncode.column(col(vecCol), cb).as(PqIndex.CodesCol))
      .write.partitionBy(ListCol).parquet(path)
    val entry = IvfPqEntry(name, table, idCol, vecCol, metric, path, centroids,
      cb, spark.read.parquet(path).count())
    registry.register(name, entry)
  }

  /** Probe → ADC over the pruned partitions → exact re-rank. Check the plan:
    * PartitionFilters prunes to the probed lists, ReadSchema is (id, codes). */
  def search(spark: SparkSession, name: String, q: Array[Float], k: Int,
      nProbe: Int, refine: Int = 8, tieBreak: Seq[String] = Nil): DataFrame = {
    val entry = registry.getOrThrow(name, "IVF-PQ")
    val d = DistanceKernels.forMetric(entry.metric)
    val probes = entry.centroids.zipWithIndex
      .map { case (c, i) => (d(q, c), i) }
      .sortBy(_._1).take(math.max(1, nProbe)).map(_._2).toSeq
    val nCand = math.min(k.toLong * refine, entry.count).toInt
    val adc = new PqIndex.AdcTable(entry.codebooks.adcTable(q), entry.codebooks.k)
    val cand = spark.read.parquet(entry.path)
      .where(col(ListCol).isin(probes: _*))
      .withColumn("__adc", PqAdcDistance.column(col(PqIndex.CodesCol), adc))
      .orderBy(col("__adc"), col(entry.idCol))
      .limit(nCand)
      .select(col(entry.idCol))
    val src = spark.table(entry.sourceTable)
      .join(broadcast(cand), Seq(entry.idCol), "left_semi")
    graft.Graft.topK(src, entry.vecCol, q, k, entry.metric, tieBreak)
  }
}
