package graft.index

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.TextSearch

/** Inverted term index for BM25 keyword search — the storage-native scale
  * path for full-text relevance, the exact text analog of [[IvfIndex]] for
  * vectors:
  *
  *   - BUILD: one tokenize pass produces posting rows (term, doc id, tf,
  *     doc length) written to parquet PARTITIONED BY a hash bucket of the
  *     term — the posting lists ARE storage partitions. Corpus stats
  *     (N, avgdl) are computed in the same pass and kept as entry metadata.
  *   - SEARCH: the query terms' buckets are computed driver-side and Spark
  *     scans ONLY those partitions (PartitionFilters prune at file-listing
  *     time); within them a `term IN (...)` row filter pushes to parquet.
  *     A 100 TB corpus reads |query-term buckets| / nBuckets of the
  *     postings, never the documents themselves.
  *
  * Because a term's postings live entirely in its bucket, df computed from
  * the pruned read is the GLOBAL df — search results are bit-identical to
  * the brute-force [[TextSearch.bm25TopK]] over the source table (the
  * correctness oracle, mirroring IVF's nProbe = nLists). Nothing must fit
  * in memory anywhere: driver state is (N, avgdl) and the bucket list. */
object TermIndex {

  /** Stats are kept in ADDITIVE form (nDocs, sumDl — exact integer-valued
    * doubles) so [[append]] can update them exactly; avgdl is derived as
    * sumDl/nDocs, the identical division avg() performs. */
  case class TermEntry(
      name: String,
      sourceTable: String,
      idCol: String,
      textCol: String,
      path: String,
      nBuckets: Int,
      nDocs: Double,
      sumDl: Double) {
    def avgDl: Double = sumDl / nDocs
  }

  private val registry = new ArtifactRegistry[TermEntry](_.path)
  def get(name: String): Option[TermEntry] = registry.get(name)

  /** The term index serving `table`, if any — how the SQL surface picks an
    * index for a table-name invocation (the engine-side analog of the
    * reference's per-table index lookup in its rewrites). */
  def forTable(table: String): Option[TermEntry] =
    registry.values.find(_.sourceTable == table)

  def list: Iterable[TermEntry] = registry.values
  /** Re-register a checkpointed entry (restart restore path —
    * artifacts already live on shared storage). */
  private[index] def restoreEntry(e: TermEntry): Unit =
    registry.update(e.name, e)

  def drop(name: String): Boolean = {
    appliedBatches.remove(name)
    registry.drop(name)
  }
  def clear(): Unit = { appliedBatches.clear(); registry.clear() }
  /** Forget entries without deleting artifacts (restart simulation). */
  def clearRegistryOnly(): Unit = { appliedBatches.clear(); registry.forgetAll() }

  val BucketCol = "__term_bucket"

  private def bucketExpr(term: org.apache.spark.sql.Column, nBuckets: Int) =
    pmod(xxhash64(term), lit(nBuckets.toLong))

  /** Tokenize + write the bucket-partitioned posting lists. */
  def create(spark: SparkSession, name: String, table: String, idCol: String,
      textCol: String, nBuckets: Int = 64,
      baseDir: String = IndexCatalog.indexArtifactDir): TermEntry = {
    require(nBuckets > 0, "nBuckets must be positive")
    registry.requireFresh(name)
    val docs = spark.table(table)
    val path = s"$baseDir/$name-term-${System.currentTimeMillis()}"
    // positional postings: BM25 reads prune the pos column away; phrase
    // queries verify adjacency from it without touching the corpus.
    // sumdl rides the SAME job as the write via an observed metric — no
    // second corpus tokenize, no postings re-read: each doc's length is
    // summed off exactly one of its posting rows (the row whose positions
    // include 1, i.e. the doc's first token — unique per non-empty doc;
    // NULL/empty-text docs have no postings and contribute no length,
    // same semantics as corpusCounts)
    val obs = org.apache.spark.sql.Observation(s"term-$name-stats")
    TextSearch.positionalPostingsFor(docs, idCol, textCol)
      .withColumn(BucketCol, bucketExpr(col("term"), nBuckets))
      .observe(obs,
        sum(when(array_contains(col("pos"), 1), col("dl"))).as("sumdl"))
      .write.partitionBy(BucketCol).parquet(path)
    val sumDl = obs.get.get("sumdl").flatMap(Option(_))
      .fold(0.0)(_.asInstanceOf[Double])
    // n counts ALL docs including empty/NULL text (they weight idf, not
    // length); a parquet-backed table serves this from footer metadata
    val nDocs = docs.count().toDouble
    registry.register(name,
      TermEntry(name, table, idCol, textCol, path, nBuckets, nDocs, sumDl))
  }

  /** Incremental ingest: append `docs`' postings as new files in their
    * term-bucket partitions and fold the corpus counts — search results
    * after an append are bit-identical to a fresh build over the union
    * (postings are additive rows; df/tf fall out of the same aggregation;
    * avgdl re-derives from the exactly-updated sums). The docs must be NEW
    * ids — re-appending an indexed doc would double-count its postings
    * (same contract as HNSW insert, which keys by rowid). Single-writer,
    * like every index build here. */
  def append(spark: SparkSession, name: String, docs: org.apache.spark.sql.DataFrame): TermEntry = {
    val entry = registry.getOrThrow(name, "term")
    TextSearch.positionalPostingsFor(docs, entry.idCol, entry.textCol)
      .withColumn(BucketCol, bucketExpr(col("term"), entry.nBuckets))
      .write.mode("append").partitionBy(BucketCol).parquet(entry.path)
    // batches are micro-batch sized — the double-tokenize corpusCounts
    // cost is bounded by the batch, unlike create's corpus-scale pass
    val stats = TextSearch.corpusCounts(docs, entry.textCol).head()
    if (stats.getDouble(0) == 0.0) return entry // empty append: no stats delta
    val updated = entry.copy(nDocs = entry.nDocs + stats.getDouble(0),
      sumDl = entry.sumDl + stats.getDouble(1))
    registry.update(name, updated)
    updated
  }

  /** Storage compaction for append-heavy indexes — the term-index analog
    * of `hnsw_compact_index`: every [[append]] adds one small file set per
    * bucket, so sustained ingest degrades scan efficiency until the
    * artifact is rewritten. Postings are immutable rows, so compaction is
    * a pure storage rewrite (one task per bucket partition) with
    * bit-identical search results; the registry swap is atomic and the old
    * artifact is deleted after. Single-writer, like append. */
  def compact(spark: SparkSession, name: String): TermEntry = {
    val entry = registry.getOrThrow(name, "term")
    val parent = new org.apache.hadoop.fs.Path(entry.path).getParent.toString
    val newPath = s"$parent/$name-term-${System.currentTimeMillis()}"
    spark.read.parquet(entry.path)
      .write.partitionBy(BucketCol).parquet(newPath)
    registry.update(name, entry.copy(path = newPath))
    ArtifactRegistry.deleteRecursively(entry.path)
    registry.getOrThrow(name, "term")
  }

  /** Watermark of the last applied streaming batch per index. Checkpointed
    * with the storage manifest and restored by StorageIndexCatalog, so the
    * idempotency guarantee survives cold restarts too. */
  private val appliedBatches = TrieMap.empty[String, Long]

  private[index] def batchWatermarks: Seq[(String, Long)] = appliedBatches.toSeq
  private[index] def restoreBatchWatermark(name: String, batchId: Long): Unit =
    if (!appliedBatches.contains(name)) appliedBatches.put(name, batchId)

  /** Idempotent streaming append: a (name, batchId) pair is applied at
    * most once, so an at-least-once foreachBatch replay of an
    * already-applied micro-batch is a no-op instead of double-counting
    * postings and stats. Structured Streaming's foreachBatch is
    * at-least-once ACROSS cold restarts as well (a batch whose append
    * completed but whose streaming commit did not is re-delivered), so the
    * watermark advance rewrites the armed checkpoint manifest — restore
    * sees it and the re-delivery no-ops. */
  def appendBatch(spark: SparkSession, name: String, docs: org.apache.spark.sql.DataFrame,
      batchId: Long): TermEntry = {
    val entry = registry.getOrThrow(name, "term")
    if (appliedBatches.get(name).exists(_ >= batchId)) return entry
    // one manifest write for the whole batch (append's stats fold would
    // otherwise rewrite it a second time on this hot path)
    StorageIndexCatalog.coalescingRewrites {
      val updated = append(spark, name, docs)
      appliedBatches.put(name, batchId)
      StorageIndexCatalog.rewriteIfArmed()
      updated
    }
  }

  /** Pre-warm the serving path after create/restore: the first search on a
    * cold index pays one-time costs that have nothing to do with the query —
    * the artifact file listing, every posting file's parquet footer, and
    * janino compilation of the BM25 scoring plan (measured ~11 s cold vs
    * ~0.8 s warm for q53 at sf0.1). This runs those costs once, at a moment
    * the operator chooses (deploy time), instead of inside the first user
    * query:
    *
    *   - `count()` over the artifact lists the files and reads every footer
    *     (parquet answers count from footer row counts — no column data
    *     moves), priming the page cache executors will hit;
    *   - one real k=1 search with a term sampled from the postings compiles
    *     the scoring plan's codegen and exercises one bucket end-to-end.
    *
    * Semantically a no-op: registry stats and search results are untouched
    * (spec-pinned). Not called from [[create]] — the build metric stays an
    * honest build cost, and a batch pipeline that never serves low-latency
    * queries shouldn't pay it. */
  def warm(spark: SparkSession, name: String): Unit = {
    val entry = registry.getOrThrow(name, "term")
    val postings = spark.read.parquet(entry.path)
    postings.count()
    postings.select("term").limit(1).collect().headOption
      .foreach(r => search(spark, name, Seq(r.getString(0)), 1).collect())
  }

  /** The query terms' partition buckets, computed with the SAME hash
    * expression the build used (a 1-row-per-term local job — no driver
    * reimplementation of xxhash64 to drift out of sync). */
  def bucketsOf(spark: SparkSession, terms: Seq[String], nBuckets: Int): Seq[Long] = {
    import spark.implicits._
    terms.toDF("term").select(bucketExpr(col("term"), nBuckets).as("b"))
      .distinct().collect().map(_.getLong(0)).toSeq
  }

  /** Top-k BM25 search through the index: identical results to
    * `TextSearch.bm25TopK(sourceTable, ...)`, reading only the query
    * terms' posting buckets. */
  def search(spark: SparkSession, name: String, terms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val entry = registry.getOrThrow(name, "term")
    scoredPostings(spark, entry, terms, k1, b)
      .orderBy(col("score").desc, col(entry.idCol))
      .limit(k)
  }

  /** Exact-phrase search through the positional postings: reads ONLY the
    * phrase terms' buckets, pivots each term's position array per doc, and
    * counts aligned occurrences (start positions p of term 1 with term j at
    * p + j − 1 for every j). Results are bit-identical to
    * [[TextSearch.phraseMatches]] over the source table — but a 100 TB
    * corpus is never scanned; cost is the phrase terms' posting lists.
    * Output: (idCol, n_matches > 0). */
  def phraseSearch(spark: SparkSession, name: String,
      phrase: Seq[String]): org.apache.spark.sql.DataFrame = {
    require(phrase.nonEmpty, "phrase must have at least one term")
    val entry = registry.getOrThrow(name, "term")
    val distinctTerms = phrase.distinct
    val buckets = bucketsOf(spark, distinctTerms, entry.nBuckets)
    val posts = spark.read.parquet(entry.path)
      .where(col(BucketCol).isin(buckets: _*))
      .where(col("term").isin(distinctTerms: _*))
      .select(col(entry.idCol), col("term"), col("pos"))
    def pcol(t: String) = s"__pos_${distinctTerms.indexOf(t)}"
    val pivoted = posts.groupBy(col(entry.idCol)).agg(
      first(when(col("term") === distinctTerms.head, col("pos")), ignoreNulls = true)
        .as(pcol(distinctTerms.head)),
      distinctTerms.tail.map(t =>
        first(when(col("term") === t, col("pos")), ignoreNulls = true).as(pcol(t))): _*)
    val allPresent = distinctTerms.map(t => col(pcol(t)).isNotNull).reduce(_ && _)
    val p0 = col(pcol(phrase.head))
    val matches =
      if (phrase.length == 1) size(p0)
      else size(filter(p0, p =>
        phrase.zipWithIndex.tail.map { case (t, j) =>
          array_contains(col(pcol(t)), p + lit(j))
        }.reduce(_ && _)))
    pivoted.where(allPresent)
      .select(col(entry.idCol), matches.cast("long").as("n_matches"))
      .where(col("n_matches") > 0)
  }

  /** All matching docs with scores (the un-limited form; search adds the
    * top-k). Split out so specs can compare full score sets. */
  /** Batch multi-query BM25 through the index — the keyword KNN-join
    * (TextSearch.bm25JoinTopK) without the corpus tokenize pass: the
    * queries' DISTINCT bucket VALUES (≤ nBuckets longs — never the terms)
    * come to the driver for partition pruning, the pruned postings
    * semi-join the term set (df from the full per-term lists stays GLOBAL
    * — bucket-completeness, same argument as [[search]]), and corpus
    * stats come from entry metadata. Results are bit-identical to the
    * brute-force join over the source table (spec-pinned). At 100 TB the
    * read is |query-term buckets| / nBuckets of the postings; documents
    * are never scanned. */
  def searchJoin(spark: SparkSession, name: String, queries: DataFrame,
      qidCol: String, termsCol: String, k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val entry = registry.getOrThrow(name, "term")
    // three consumers (bucket collect, semi-join, score join): materialize
    // the exploded query-term table once (driver-local when small —
    // TextSearch.materializeQterms — so the bucket collect and the distinct
    // below fold to LocalRelation work instead of re-running the explode)
    val (qpos, maxTerms) = TextSearch.materializeQterms(queries, qidCol, termsCol)
    val buckets = qpos
      .select(bucketExpr(col("term"), entry.nBuckets).as("__b")).distinct()
      .collect().map(_.getLong(0)).toSeq
    val postings = spark.read.parquet(entry.path)
      .where(col(BucketCol).isin(buckets: _*)) // partition pruning
      .join(broadcast(qpos.select(col("term")).distinct()),
        Seq("term"), "left_semi")
    val stats = spark.range(1)
      .select(lit(entry.nDocs).as("n"), lit(entry.avgDl).as("avgdl"))
    TextSearch.bm25JoinScored(postings, stats, qpos, maxTerms, entry.idCol,
      qidCol, k, k1, b)
  }

  /** Corpus vocabulary rollup through the index — identical output to
    * `TextSearch.termStats(sourceTable, ...)` (the artifact holds the SAME
    * (term, doc, tf) tuples the live tokenize pass produces —
    * bucket-completeness, the df argument [[search]] relies on), but the
    * corpus is never re-tokenized: one bucketed-artifact scan with a
    * map-side-combined per-term rollup. */
  def termStats(spark: SparkSession, name: String): DataFrame = {
    val entry = registry.getOrThrow(name, "term")
    spark.read.parquet(entry.path)
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df"),
        sum(col("tf")).cast(org.apache.spark.sql.types.LongType).as("total_tf"))
  }

  def scoredPostings(spark: SparkSession, entry: TermEntry, terms: Seq[String],
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val buckets = bucketsOf(spark, terms, entry.nBuckets)
    val postings = spark.read.parquet(entry.path)
      .where(col(BucketCol).isin(buckets: _*)) // partition pruning
      .where(col("term").isin(terms: _*)) // parquet row-group filter
    val stats = spark.range(1)
      .select(lit(entry.nDocs).as("n"), lit(entry.avgDl).as("avgdl"))
    TextSearch.scorePostings(postings, stats, entry.idCol, terms, k1, b)
  }
}
