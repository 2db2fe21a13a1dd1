package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Registered MinHash-signature artifact — the TermIndex pattern applied
  * to dedup. The signature table (id, mh0..mh{p-1}) is the compute-heavy
  * half of every MinHash pipeline (shingle explode + 2 md5s per shingle +
  * per-doc min aggregate); pair mining, duplicate clustering and
  * leakage-safe splitting all start from it. Materializing it ONCE as a
  * storage-backed artifact turns those passes into cheap band joins over
  * a parquet scan — at 100 TB the signature table is ~1% of corpus bytes,
  * and the expensive text pass runs once per corpus, not once per
  * consumer.
  *
  * Storage-backed family like IVF/PQ/Term: registry entry + parquet
  * artifact, checkpoint/restore via StorageIndexCatalog, drop reclaims
  * storage. */
object DedupSignatures {

  /** Registry entry: where the signatures live and the parameters they
    * were built under (pair mining must band the same permutations). */
  case class SigEntry(
      name: String,
      table: String,
      idCol: String,
      textCol: String,
      shingleLen: Int,
      numPerms: Int,
      path: String)

  private val registry = new ArtifactRegistry[SigEntry](_.path)

  def get(name: String): Option[SigEntry] = registry.get(name)
  def list: Iterable[SigEntry] = registry.values
  private[index] def restoreEntry(e: SigEntry): Unit =
    registry.update(e.name, e)
  def drop(name: String): Boolean = registry.drop(name)
  def clear(): Unit = registry.clear()
  /** Forget entries without deleting artifacts (restart simulation). */
  def clearRegistryOnly(): Unit = registry.forgetAll()

  /** Compute and persist the signature table for `table`. One distributed
    * pass: shingle explode → md5 permutations → per-doc min aggregate →
    * parquet write. */
  def create(spark: SparkSession, name: String, table: String, idCol: String,
      textCol: String, shingleLen: Int = 3, numPerms: Int = 8,
      baseDir: String = IndexCatalog.indexArtifactDir): SigEntry = {
    registry.requireFresh(name)
    val path = s"$baseDir/$name-sigs-${System.currentTimeMillis()}"
    graft.ops.Dedup.minHashSignatures(
        spark.table(table), idCol, textCol, shingleLen, numPerms)
      .write.parquet(path)
    registry.register(name,
      SigEntry(name, table, idCol, textCol, shingleLen, numPerms, path))
  }

  /** The materialized signature table (idCol, mh0..mh{p-1}). */
  def signatures(spark: SparkSession, name: String): DataFrame =
    spark.read.parquet(registry.getOrThrow(name, "dedup-signature").path)

  /** LSH candidate pairs (a, b, est_sim) through the artifact — identical
    * output to `Dedup.minHashLshPairs` over the source table (spec-pinned),
    * but the corpus text pass is skipped: all three consumers of the
    * signature table (band explode + both verify sides) read the pruned
    * parquet scan. */
  def pairs(spark: SparkSession, name: String, rowsPerBand: Int = 2): DataFrame = {
    val e = registry.getOrThrow(name, "dedup-signature")
    graft.ops.Dedup.lshPairsFromSignatures(
      signatures(spark, name), e.idCol, e.numPerms, rowsPerBand)
  }

  /** Incremental append: signatures for `rows` (same schema as the source
    * table) land as new files in the artifact — the additive-storage
    * contract shared with TermIndex.append. Correct because MinHash
    * signatures are per-document: new docs add rows, they never change
    * existing ones. The registry entry is re-put so the armed checkpoint
    * manifest (StorageIndexCatalog) records the append. */
  def append(spark: SparkSession, name: String, rows: DataFrame): SigEntry = {
    val e = registry.getOrThrow(name, "dedup-signature")
    graft.ops.Dedup.minHashSignatures(rows, e.idCol, e.textCol,
        e.shingleLen, e.numPerms)
      .write.mode("append").parquet(e.path)
    registry.update(name, e)
    e
  }
}
