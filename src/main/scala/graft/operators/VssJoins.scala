package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.MinByK.{maxByK, minByK}
import graft.functions.vector

/** Brute-force (index-free) KNN join/match — the Spark-native re-expression of
  * the reference's `vss_join` / `vss_match` SQL table macros
  * (reference src/hnsw/hnsw_index_macros.cpp:10-75).
  *
  * Score semantics follow the reference macro exactly
  * (reference src/hnsw/hnsw_index_macros.cpp:22-41):
  *   - metric l2sq / l2  → score = `array_distance` (√ of the squared sum),
  *     keep the k MINIMUM scores (`min_by`);
  *   - metric cosine/cos → score = `array_cosine_similarity`, keep the k
  *     MAXIMUM scores (`max_by`);
  *   - metric ip         → score = `array_inner_product`, keep the k MAXIMUM.
  *
  * The reference macro scores all pairs per left-row occurrence (correlated
  * lateral), so duplicate left rows each get their own k matches — preserved
  * here by grouping on a per-row id, not on the row's values.
  *
  * Scale shape: crossJoin(broadcast(right)) → score → groupBy(left row id) →
  * bounded top-k aggregate. The aggregate does map-side partial aggregation,
  * so the one shuffle carries at most k rows per left row — unlike a
  * window-function formulation, which shuffles the full n×m cross product.
  * At 100TB the left side streams partition-parallel; the right side must fit
  * in a broadcast — beyond that, use the index-accelerated knnJoin.
  */
object VssJoins {

  /** (score column, keep-maximum?) for a macro metric name. */
  private def scoreSpec(metric: String, leftCol: String, rightCol: String): (Column, Boolean) = {
    val a = col(s"left_tbl.$leftCol"); val b = col(s"right_tbl.$rightCol")
    metric match {
      case "l2sq" | "l2"    => (vector.array_distance(a, b), false)
      case "cosine" | "cos" => (vector.array_cosine_similarity(a, b), true)
      case "ip"             => (vector.array_inner_product(a, b), true)
      case other => throw new IllegalArgumentException(s"Unknown metric: $other")
    }
  }

  private def topK(score: Column, value: Column, k: Int, descending: Boolean): Column =
    if (descending) maxByK(value, score, k) else minByK(value, score, k)

  /** For every left row: the k best-scoring right rows. Output columns mirror
    * the reference macro: `score DOUBLE, left_tbl STRUCT(<left columns>),
    * right_tbl STRUCT(<right columns>)`, plus a 1-indexed `rank` (best first —
    * the reference's KNN join emits the same,
    * reference src/hnsw/hnsw_optimize_join.cpp:148). */
  def vssJoin(left: DataFrame, right: DataFrame, leftCol: String, rightCol: String,
      k: Int, metric: String = "l2sq"): DataFrame = {
    val l = left
      .select(struct(left.columns.map(col).toIndexedSeq: _*).as("left_tbl"))
      .withColumn("__lrid", monotonically_increasing_id())
    val r = right.select(struct(right.columns.map(col).toIndexedSeq: _*).as("right_tbl"))
    val (score, desc) = scoreSpec(metric, leftCol, rightCol)
    l.crossJoin(broadcast(r))
      .select(col("__lrid"), col("left_tbl"), col("right_tbl"), score.as("score"))
      .where(col("score").isNotNull) // NULL vectors never match (reference NULL semantics)
      .groupBy(col("__lrid"))
      .agg(
        first(col("left_tbl")).as("left_tbl"),
        topK(col("score"), struct(col("score"), col("right_tbl")), k, desc).as("matches"))
      .select(col("left_tbl"), posexplode(col("matches")).as(Seq("pos", "m")))
      .select(
        col("m.score").as("score"),
        col("left_tbl"),
        col("m.right_tbl").as("right_tbl"),
        (col("pos") + 1).cast("bigint").as("rank")) // 1-indexed rank
  }

  /** Correlated variant: every left row annotated with a `matches` array of
    * the k best `{score, row}` structs (reference `vss_match`,
    * reference src/hnsw/hnsw_index_macros.cpp:49-75). Left rows whose vector
    * is NULL (or with no scorable right rows) keep an empty `matches`. */
  def vssMatch(left: DataFrame, right: DataFrame, leftCol: String, rightCol: String,
      k: Int, metric: String = "l2sq"): DataFrame = {
    val l = left
      .select(struct(left.columns.map(col).toIndexedSeq: _*).as("left_tbl"))
      .withColumn("__lrid", monotonically_increasing_id())
    val r = right.select(struct(right.columns.map(col).toIndexedSeq: _*).as("right_tbl"))
    val (score, desc) = scoreSpec(metric, leftCol, rightCol)
    l.crossJoin(broadcast(r))
      .select(col("__lrid"), col("left_tbl"),
        struct(score.as("score"), col("right_tbl").as("row")).as("cand"))
      .groupBy(col("__lrid"))
      .agg(
        first(col("left_tbl")).as("left_tbl"),
        topK(col("cand.score"), col("cand"), k, desc).as("matches"))
      .select(col("left_tbl"), col("matches"))
  }
}
