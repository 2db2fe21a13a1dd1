package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.MinByK.minByK
import graft.functions.vector

/** Brute-force (index-free) KNN join/match — the Spark-native re-expression of
  * the reference's `vss_join` / `vss_match` SQL table macros
  * (reference src/hnsw/hnsw_index_macros.cpp:10-75).
  *
  * The reference macro scores all pairs and keeps the k best per left row via
  * k-ary `min_by`. Here the same semantics compose as:
  * crossJoin(broadcast(right)) → score → groupBy(left row) → minByK.
  * The bounded top-k aggregate does map-side partial aggregation, so the
  * shuffle carries at most k rows per left row — unlike a window-function
  * formulation, which shuffles the full n×m cross product. With the right
  * side broadcast there is exactly ONE shuffle (the k-bounded group-by), and
  * the cross product itself never materializes off-heap. At 100TB the left
  * side streams partition-parallel; the right side must fit in a broadcast —
  * beyond that, use an index-accelerated knnJoin.
  */
object VssJoins {

  private def scoreCol(metric: String, leftCol: String, rightCol: String): Column =
    vector.metricDistance(metric)(col(s"left_tbl.$leftCol"), col(s"right_tbl.$rightCol"))

  /** For every left row: the k right rows with the smallest metric distance.
    * Output columns mirror the reference macro: `score DOUBLE,
    * left_tbl STRUCT(<left columns>), right_tbl STRUCT(<right columns>)`,
    * plus a 1-indexed `rank` (the reference's KNN join emits the same,
    * reference src/hnsw/hnsw_optimize_join.cpp:148). */
  def vssJoin(left: DataFrame, right: DataFrame, leftCol: String, rightCol: String,
      k: Int, metric: String = "l2sq"): DataFrame = {
    val l = left.select(struct(left.columns.map(col).toIndexedSeq: _*).as("left_tbl"))
    val r = right.select(struct(right.columns.map(col).toIndexedSeq: _*).as("right_tbl"))
    val score = scoreCol(metric, leftCol, rightCol)
    l.crossJoin(broadcast(r))
      .select(col("left_tbl"), col("right_tbl"), score.as("score"))
      .where(col("score").isNotNull) // NULL vectors never match (reference NULL semantics)
      .groupBy(col("left_tbl"))
      .agg(minByK(struct(col("score"), col("right_tbl")), col("score"), k).as("matches"))
      .select(col("left_tbl"), posexplode(col("matches")).as(Seq("pos", "m")))
      .select(
        col("m.score").as("score"),
        col("left_tbl"),
        col("m.right_tbl").as("right_tbl"),
        (col("pos") + 1).cast("bigint").as("rank")) // 1-indexed rank
  }

  /** Correlated variant: every left row annotated with a `matches` array of
    * the k best `{score, row}` structs (reference `vss_match`,
    * reference src/hnsw/hnsw_index_macros.cpp:49-75). */
  def vssMatch(left: DataFrame, right: DataFrame, leftCol: String, rightCol: String,
      k: Int, metric: String = "l2sq"): DataFrame = {
    val l = left.select(struct(left.columns.map(col).toIndexedSeq: _*).as("left_tbl"))
    val r = right.select(struct(right.columns.map(col).toIndexedSeq: _*).as("right_tbl"))
    val score = scoreCol(metric, leftCol, rightCol)
    l.crossJoin(broadcast(r))
      .select(col("left_tbl"), struct(score.as("score"), col("right_tbl").as("row")).as("cand"))
      .where(col("cand.score").isNotNull)
      .groupBy(col("left_tbl"))
      .agg(minByK(col("cand"), col("cand.score"), k).as("matches"))
  }
}
