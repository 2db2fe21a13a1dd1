package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Registered hashed-shingle artifact: the exploded (id, xxhash64 shingle)
  * table, persisted ONCE per corpus as a shingle-BUCKETED table. The
  * shingle explode over corpus text is the dominant cost of n-gram
  * Jaccard mining, corpus-duplication signals and decontamination; the
  * artifact replaces that pass with a parquet scan, and bucketing by
  * shingle makes the self-join and the by-shingle aggregates
  * exchange-free (Spark bucketed-join: both sides bucketed on the key
  * with equal bucket counts → no shuffle).
  *
  * Storage-backed family like IVF/PQ/Term/DedupSignatures. The bucket
  * METADATA lives in the session catalog (bucketed reads require a
  * catalog table), so restore re-issues the `CREATE TABLE … CLUSTERED
  * BY` DDL over the existing parquet LOCATION — no data movement. */
object ShingleIndex {

  case class ShingleEntry(
      name: String,
      table: String,
      idCol: String,
      textCol: String,
      shingleLen: Int,
      nBuckets: Int,
      path: String)

  private val registry = new ArtifactRegistry[ShingleEntry](_.path)

  def get(name: String): Option[ShingleEntry] = registry.get(name)
  def list: Iterable[ShingleEntry] = registry.values
  private[index] def restoreEntry(e: ShingleEntry): Unit =
    registry.update(e.name, e)
  def drop(name: String): Boolean = {
    // external catalog table: DROP TABLE removes only the bucket metadata;
    // registry.drop reclaims the parquet LOCATION
    org.apache.spark.sql.SparkSession.getActiveSession
      .foreach(_.sql(s"DROP TABLE IF EXISTS ${catalogTable(name)}"))
    registry.drop(name)
  }
  def clear(): Unit = list.map(_.name).toSeq.foreach(drop)
  /** Forget entries without deleting artifacts (restart simulation). */
  def clearRegistryOnly(): Unit = registry.forgetAll()

  /** The catalog table carrying the bucket metadata for `name`. */
  private def catalogTable(name: String): String = s"__graft_shingles_$name"

  /** Explode + hash the corpus once, bucketed by shingle. One distributed
    * pass; the artifact is ~(rows × shingles/doc × 16 bytes). */
  def create(spark: SparkSession, name: String, table: String, idCol: String,
      textCol: String, shingleLen: Int = 3, nBuckets: Int = 32,
      baseDir: String = IndexCatalog.indexArtifactDir): ShingleEntry = {
    registry.requireFresh(name)
    val path = s"$baseDir/$name-shingles-${System.currentTimeMillis()}"
    spark.sql(s"DROP TABLE IF EXISTS ${catalogTable(name)}")
    graft.ops.Dedup.hashedShingles(spark.table(table), idCol, textCol, shingleLen)
      // align write partitions to the bucket function (same murmur3+pmod):
      // each task then writes exactly ONE bucket file instead of one file
      // per (task × bucket) — tasks×buckets small files is the classic
      // bucketed-write problem, and every downstream bucketed read pays it
      .repartition(nBuckets, org.apache.spark.sql.functions.col("shingle"))
      .write
      .bucketBy(nBuckets, "shingle").sortBy("shingle")
      .option("path", path)
      .saveAsTable(catalogTable(name))
    registry.register(name,
      ShingleEntry(name, table, idCol, textCol, shingleLen, nBuckets, path))
  }

  /** The materialized (idCol, shingle) table, bucketed by shingle. After a
    * restart the parquet survives but the session catalog (which holds the
    * bucket spec) does not — re-issue the DDL over the existing LOCATION. */
  def shingles(spark: SparkSession, name: String): DataFrame = {
    val e = registry.getOrThrow(name, "shingle")
    val ct = catalogTable(name)
    if (!spark.catalog.tableExists(ct)) {
      // the id column keeps the SOURCE table's type (string ids are as
      // legal as longs) — read it off the parquet footer instead of
      // assuming BIGINT, or every post-restore read fails on conversion
      val idType = spark.read.parquet(e.path).schema(e.idCol).dataType.sql
      spark.sql(
        s"""CREATE TABLE $ct (`${e.idCol}` $idType, shingle BIGINT)
           |USING PARQUET
           |CLUSTERED BY (shingle) SORTED BY (shingle) INTO ${e.nBuckets} BUCKETS
           |LOCATION '${e.path}'""".stripMargin)
    }
    spark.table(ct)
  }
}
