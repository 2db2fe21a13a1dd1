package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.vector

/** IVF (inverted-file) ANN index — the storage-native scale path for
  * similarity search, complementing the graph-based HNSW index:
  *
  *   - TRAIN: k-means (Lloyd's, seeded, driver-side over a bounded sample)
  *     produces `nLists` coarse centroids.
  *   - BUILD: every vector is assigned to its nearest centroid with a pure
  *     codegen'd column expression and the table is written to parquet
  *     PARTITIONED BY the list id — the inverted lists ARE storage
  *     partitions.
  *   - SEARCH: the query's `nProbe` nearest centroids are found driver-side
  *     (nLists tiny), and Spark scans ONLY those partitions — the plan's
  *     PartitionFilters prune everything else at file-listing time, so a
  *     100 TB index reads nProbe/nLists of the data. Within the probed
  *     lists, exact distance top-k (TakeOrderedAndProject).
  *
  * `nProbe = nLists` scans everything and is EXACT — the correctness oracle
  * for the approximate settings, mirroring how ef >= N makes HNSW exact.
  * Unlike the HNSW artifact, nothing here must fit in memory anywhere: the
  * only driver state is the centroid table (nLists × dim floats). */
object IvfIndex {

  case class IvfEntry(
      name: String,
      sourceTable: String,
      vecCol: String,
      metric: String,
      path: String,
      centroids: Array[Array[Float]],
      // per-list max member↔centroid distance (the list's covering radius,
      // in the entry's metric) — lets radius queries prune lists LOSSLESSLY
      // via the triangle inequality
      listRadii: Map[Int, Double] = Map.empty)

  private val registry = new ArtifactRegistry[IvfEntry](_.path)
  def get(name: String): Option[IvfEntry] = registry.get(name)
  def list: Iterable[IvfEntry] = registry.values
  /** Re-register a checkpointed entry (restart restore path —
    * artifacts already live on shared storage). */
  private[index] def restoreEntry(e: IvfEntry): Unit =
    registry.update(e.name, e)
  def drop(name: String): Boolean = registry.drop(name)
  def clear(): Unit = registry.clear()
  /** Forget entries without deleting artifacts (restart simulation). */
  def clearRegistryOnly(): Unit = registry.forgetAll()

  val ListCol = "__ivf_list"

  private def distFn(metric: String) = DistanceKernels.forMetric(metric)

  /** Seeded Lloyd's k-means over a driver-side sample (capped, so driver
    * memory is bounded regardless of table size). Deterministic for a fixed
    * seed: sample, init, and iteration order are all fixed. */
  def train(df: DataFrame, vecCol: String, nLists: Int, metric: String,
      iters: Int = 10, sampleCap: Int = 10000, seed: Long = 42L): Array[Array[Float]] = {
    require(nLists > 0, "nLists must be positive")
    // hash-ordered cap instead of limit(): limit takes whatever partitions
    // answer first, so the sample would depend on partition layout — the
    // xxhash64 order is a deterministic pseudo-random draw from the data
    // itself (TakeOrderedAndProject: no full shuffle)
    val rows = df.select(col(vecCol)).where(col(vecCol).isNotNull)
      .orderBy(xxhash64(col(vecCol)))
      .limit(sampleCap).collect()
    require(rows.nonEmpty, "cannot train IVF on an empty table")
    val sample = rows.map(_.getSeq[Float](0).toArray)
    val d = distFn(metric)
    // init: seeded shuffle of the DISTINCT sample vectors — bounding by the
    // distinct count, not the sample size (duplicate-heavy tables would
    // otherwise make a pick-until-distinct loop spin forever)
    val distinctVecs = new scala.util.Random(seed)
      .shuffle(sample.map(_.toSeq).distinct.toSeq)
    val centroids = distinctVecs.take(math.min(nLists, distinctVecs.length))
      .map(_.toArray).toBuffer
    val k = centroids.length
    val dim = sample.head.length
    var it = 0
    while (it < iters) {
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Int](k)
      sample.foreach { v =>
        var best = 0; var bestD = d(v, centroids(0))
        var i = 1
        while (i < k) {
          val di = d(v, centroids(i))
          if (di < bestD) { best = i; bestD = di }
          i += 1
        }
        counts(best) += 1
        var j = 0
        while (j < dim) { sums(best)(j) += v(j); j += 1 }
      }
      var i = 0
      while (i < k) {
        if (counts(i) > 0) {
          var j = 0
          while (j < dim) { centroids(i)(j) = (sums(i)(j) / counts(i)).toFloat; j += 1 }
        }
        i += 1
      }
      it += 1
    }
    centroids.toArray
  }

  /** Nearest-centroid id as a pure column expression (codegen'd; the
    * assignment pass is a narrow map over the table). */
  private[index] def assignExpr(vecCol: String, centroids: Array[Array[Float]],
      metric: String): org.apache.spark.sql.Column = {
    val scored = centroids.zipWithIndex.map { case (c, i) =>
      struct(vector.metricDistance(metric)(col(vecCol), lit(c)).as("d"),
        lit(i).as("i"))
    }
    array_min(array(scored.toIndexedSeq: _*)).getField("i")
  }

  /** Train + assign + write the partitioned inverted lists. */
  def create(spark: SparkSession, name: String, table: String, vecCol: String,
      nLists: Int, metric: String = "l2sq", iters: Int = 10,
      seed: Long = 42L, baseDir: String = IndexCatalog.indexArtifactDir): IvfEntry = {
    require(nLists > 0, "nLists must be positive")
    registry.requireFresh(name)
    val df = spark.table(table)
    val centroids = train(df, vecCol, nLists, metric, iters, seed = seed)
    val path = s"$baseDir/$name-ivf-${System.currentTimeMillis()}"
    df.where(col(vecCol).isNotNull)
      .withColumn(ListCol, assignExpr(vecCol, centroids, metric))
      .write.partitionBy(ListCol).parquet(path)
    // covering radius per list: one aggregate pass over the written lists
    // (distance to the row's OWN centroid via element_at on the centroid
    // distance array). Distributed, map-side combined — never driver-bound.
    val centDists = array(centroids.toIndexedSeq.map(c =>
      vector.metricDistance(metric)(col(vecCol), lit(c))): _*)
    val radii = spark.read.parquet(path)
      .select(col(ListCol).cast("int").as(ListCol),
        element_at(centDists, col(ListCol).cast("int") + 1).as("__cd"))
      .groupBy(col(ListCol)).agg(max(col("__cd")).as("__maxd"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    registry.register(name,
      IvfEntry(name, table, vecCol, metric, path, centroids, radii))
  }

  /** Incremental append: assign `rows` (same schema as the source table)
    * to the EXISTING centroids and add them to the inverted lists as new
    * parquet files inside each list's partition directory — the same
    * additive-storage contract as TermIndex.append. Centroids are fixed
    * (standard IVF maintenance; retrain = rebuild), covering radii merge
    * by max, so radius pruning stays lossless after any number of appends
    * and a search after append is identical to a fresh build over the
    * union with the same centroids. Distributed end to end. */
  def append(spark: SparkSession, name: String, rows: DataFrame): IvfEntry = {
    val entry = registry.getOrThrow(name, "IVF")
    // pin the assignment: the write and the radii aggregate must see the
    // SAME rows — re-evaluating a nondeterministic input (sample/limit)
    // could leave a written row out of the radius computation and silently
    // break the lossless-pruning guarantee
    val assigned = rows.where(col(entry.vecCol).isNotNull)
      .withColumn(ListCol, assignExpr(entry.vecCol, entry.centroids, entry.metric))
      .localCheckpoint()
    assigned.write.mode("append").partitionBy(ListCol).parquet(entry.path)
    val centDists = array(entry.centroids.toIndexedSeq.map(c =>
      vector.metricDistance(entry.metric)(col(entry.vecCol), lit(c))): _*)
    val newRadii = assigned
      .select(col(ListCol).cast("int").as(ListCol),
        element_at(centDists, col(ListCol).cast("int") + 1).as("__cd"))
      .groupBy(col(ListCol)).agg(max(col("__cd")).as("__maxd"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val merged = (entry.listRadii.keySet ++ newRadii.keySet).map { i =>
      i -> math.max(entry.listRadii.getOrElse(i, 0.0), newRadii.getOrElse(i, 0.0))
    }.toMap
    val updated = entry.copy(listRadii = merged)
    registry.update(name, updated)
    updated
  }

  /** The query's nProbe nearest inverted lists (driver-side, nLists tiny). */
  def probeLists(entry: IvfEntry, q: Array[Float], nProbe: Int): Seq[Int] = {
    val d = distFn(entry.metric)
    entry.centroids.zipWithIndex
      .map { case (c, i) => (d(q, c), i) }
      .sortBy(_._1).take(math.max(1, nProbe)).map(_._2).toSeq
  }

  /** Top-k search probing `nProbe` lists; `nProbe >= nLists` is exact.
    * The where() on the partition column prunes at file-listing time —
    * check PartitionFilters in the plan. `tieBreak` columns make boundary
    * ties deterministic (duplicate vectors straddling rank k). */
  def search(spark: SparkSession, name: String, q: Array[Float], k: Int,
      nProbe: Int, tieBreak: Seq[String] = Nil): DataFrame = {
    val entry = registry.getOrThrow(name, "IVF")
    val probes = probeLists(entry, q, nProbe)
    val pruned = spark.read.parquet(entry.path)
      .where(col(ListCol).isin(probes: _*))
    graft.Graft.topK(pruned, entry.vecCol, q, k, entry.metric, tieBreak)
      .drop(ListCol)
  }

  /** EXACT radius search with lossless storage pruning: list i can hold a
    * point within radius `r` of the query only if, by the triangle
    * inequality, `‖q−cᵢ‖ ≤ √r' + √radiusᵢ` (distances compared in the L2
    * domain; r' and the stored covering radius are l2sq). Lists failing the
    * bound are skipped at FILE-LISTING time via the partition filter, and
    * the within-list `dist <= r` filter is exact — so unlike top-k probing
    * there is NO recall trade-off: a 100 TB radius query reads only the
    * lists whose covering ball intersects the query ball.
    *
    * L2-family metrics only (the triangle inequality is the pruning
    * proof); cosine radius on unit-normalized vectors maps to l2sq via
    * d_l2sq = 2·d_cos. */
  def radiusSearch(spark: SparkSession, name: String, q: Array[Float],
      r: Double): DataFrame = {
    val entry = registry.getOrThrow(name, "IVF")
    require(entry.metric == "l2sq" || entry.metric == "l2",
      s"radiusSearch requires an L2-family metric, got '${entry.metric}'")
    val d = distFn(entry.metric)
    val toL2 = (x: Double) =>
      if (entry.metric == "l2sq") math.sqrt(math.max(x, 0.0)) else x
    val probes = entry.centroids.indices.filter { i =>
      val cover = entry.listRadii.getOrElse(i, 0.0)
      toL2(d(q, entry.centroids(i))) <= toL2(r) + toL2(cover)
    }
    val scan = spark.read.parquet(entry.path)
    val pruned =
      if (probes.isEmpty) scan.where(lit(false))
      else scan.where(col(ListCol).isin(probes: _*))
    graft.Graft.radiusSearch(pruned, entry.vecCol, q, r, entry.metric)
      .drop(ListCol)
  }
}
