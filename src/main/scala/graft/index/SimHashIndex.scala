package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Registered SimHash-fingerprint artifact: the per-document 64-bit
  * fingerprint table (id, simhash bit string, packed __h0/__h1 words),
  * persisted once per corpus. The 64-vote fingerprint aggregation over
  * tokenized text is the dominant cost of SimHash lookup (simHashTopK)
  * and banded near-dup pair mining (simHashNearDupPairs); the artifact
  * replaces it with a parquet scan. Third dedup artifact family next to
  * [[DedupSignatures]] and [[ShingleIndex]]; same storage-backed
  * lifecycle (checkpoint/restore/drop, additive append — fingerprints
  * are per-document). */
object SimHashIndex {

  case class SimHashEntry(
      name: String,
      table: String,
      idCol: String,
      textCol: String,
      path: String)

  private val registry = new ArtifactRegistry[SimHashEntry](_.path)

  def get(name: String): Option[SimHashEntry] = registry.get(name)
  def list: Iterable[SimHashEntry] = registry.values
  private[index] def restoreEntry(e: SimHashEntry): Unit =
    registry.update(e.name, e)
  def drop(name: String): Boolean = registry.drop(name)
  def clear(): Unit = registry.clear()
  /** Forget entries without deleting artifacts (restart simulation). */
  def clearRegistryOnly(): Unit = registry.forgetAll()

  /** One fingerprint pass over the corpus → parquet. */
  def create(spark: SparkSession, name: String, table: String, idCol: String,
      textCol: String,
      baseDir: String = IndexCatalog.indexArtifactDir): SimHashEntry = {
    registry.requireFresh(name)
    val path = s"$baseDir/$name-simhash-${System.currentTimeMillis()}"
    graft.ops.Dedup.simHashPacked(spark.table(table), idCol, textCol)
      .write.parquet(path)
    registry.register(name, SimHashEntry(name, table, idCol, textCol, path))
  }

  /** The materialized packed fingerprint table
    * (idCol, simhash, __h0, __h1). */
  def fingerprints(spark: SparkSession, name: String): DataFrame =
    spark.read.parquet(registry.getOrThrow(name, "simhash").path)

  /** Additive append for new documents (same schema as the source
    * table). */
  def append(spark: SparkSession, name: String, rows: DataFrame): SimHashEntry = {
    val e = registry.getOrThrow(name, "simhash")
    graft.ops.Dedup.simHashPacked(rows, e.idCol, e.textCol)
      .write.mode("append").parquet(e.path)
    registry.update(name, e)
    e
  }
}
