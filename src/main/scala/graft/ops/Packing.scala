package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic corpus shuffle + fixed-token-budget sequence packing for
  * training-data pipelines.
  *
  * Training runs want (a) a reproducible pseudo-random document order that
  * does not depend on file layout or partitioning, and (b) documents
  * concatenated into fixed-size token sequences ("packing"). The naive
  * formulation — global `ORDER BY md5(id)` plus a running token total — is a
  * single-partition window, the classic scale-killer. Here the order is
  * two-level instead: bucket = first byte of md5(id) (a uniform 256-way
  * split), then md5 order within the bucket. Packing runs per bucket
  * (window partitioned by bucket), so the shuffle is uniform 256-way and
  * every bucket packs in parallel; at larger scale widen to the first k hex
  * chars (16^k buckets). Pack identity is (bucket, pack_id); concatenation
  * order is fully determined by (bucket, md5 key), independent of input
  * layout — the md5 derivation keeps the whole pipeline replayable in any
  * SQL engine.
  */
object Packing {

  /** Engine-portable deterministic shuffle key. */
  def shuffleKey(idCol: Column): Column = md5(idCol.cast(StringType))

  /** Assign every document a (bucket, pack_id) under `budget` tokens per
    * pack, in deterministic-shuffle order: within its bucket, a document
    * whose preceding documents total T tokens goes to pack floor(T/budget) —
    * concat-then-chunk semantics (a document straddling a boundary belongs
    * to the pack its first token lands in). Returns
    * (idCol, bucket, pack_id, n_tokens). */
  def packAssignments(docs: DataFrame, idCol: String, tokenCol: Column,
      budget: Int): DataFrame = {
    require(budget > 0, "budget must be positive")
    val withKey = docs
      .select(col(idCol), tokenCol.cast(LongType).as("n_tokens"))
      .withColumn("__key", shuffleKey(col(idCol)))
      .withColumn("bucket", Sampling.hashBucket(col(idCol)))
    val w = Window.partitionBy(col("bucket")).orderBy(col("__key"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withKey
      .withColumn("__cum", sum(col("n_tokens")).over(w))
      .select(col(idCol), col("bucket"),
        floor((col("__cum") - col("n_tokens")).cast(DoubleType) / budget)
          .as("pack_id"),
        col("n_tokens"))
  }

  /** Per-pack rollup of [[packAssignments]]: document count and token total
    * per (bucket, pack_id). All packs except possibly the last of each
    * bucket start within `budget` tokens of the previous one. */
  def packSummary(assignments: DataFrame): DataFrame =
    assignments.groupBy(col("bucket"), col("pack_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("sum_tokens"))
}
