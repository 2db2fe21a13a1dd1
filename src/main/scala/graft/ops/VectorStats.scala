package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Per-group vector statistics — the cluster-analytics primitive behind
  * k-means maintenance, per-source embedding drift monitoring, and
  * class-centroid classifiers over embedding corpora. */
object VectorStats {

  /** Element-wise mean vector per group: explode to (group, dim, val),
    * one map-side-combined aggregate keyed by (group, dim), and an ordered
    * rebuild — two keyed shuffles, no collect, group cardinality × dim
    * rows of state. Double sums are order-free (Spark's reduction order is
    * partition-dependent), so results are deterministic only to float
    * addition reordering ~1 ulp · log n; the fixed-point projection
    * [[centroidSumsFixedPoint]] is the hash-exact variant for oracles.
    *
    * Returns (groupCol, centroid array<double>, n BIGINT). */
  def centroids(df: DataFrame, groupCol: String, vecCol: String): DataFrame = {
    val exploded = df
      .where(col(vecCol).isNotNull)
      .select(col(groupCol), posexplode(col(vecCol)).as(Seq("__dim", "__v")))
    exploded
      .groupBy(col(groupCol), col("__dim"))
      .agg(avg(col("__v")).as("__avg"), count(lit(1)).as("__n"))
      .groupBy(col(groupCol))
      .agg(
        transform(
          sort_array(collect_list(struct(col("__dim"), col("__avg")))),
          s => s.getField("__avg")).as("centroid"),
        max(col("__n")).as("n"))
  }

  /** Exact fixed-point projection of the centroid aggregation: per
    * (group, dim), Σ floor(val · 2^20) and the member count — integer
    * arithmetic end to end, so the distributed sum is order-independent
    * and replays bit-exactly in any engine (floor, not cast: engines
    * disagree on double→int rounding, never on floor). The caller divides
    * sum_fp by (n · 2^20) for a centroid quantized at 2⁻²⁰ ≈ 1e-6 —
    * [[centroids]] is the full-precision variant. */
  def centroidSumsFixedPoint(df: DataFrame, groupCol: String,
      vecCol: String): DataFrame =
    df.where(col(vecCol).isNotNull)
      .select(col(groupCol), posexplode(col(vecCol)).as(Seq("dim", "__v")))
      .groupBy(col(groupCol), col("dim"))
      .agg(
        sum(floor(col("__v").cast(DoubleType) * lit(1048576.0)).cast(LongType))
          .as("sum_fp"),
        count(lit(1)).as("n"))
}
