package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multi-vector (late-interaction) scoring — the ColBERT/MaxSim retrieval
  * primitive: a QUERY is a small set of vectors (token/chunk embeddings),
  * a candidate is a GROUP of corpus vectors, and the score is
  * Σ_{q ∈ query} max_{d ∈ group} sim(q, d): every query vector finds its
  * best match in the group, matches are summed.
  *
  * Relational shape (100 TB ready): the query set is broadcast (queries
  * are small by construction), the corpus streams through one narrow
  * similarity projection, and the two reductions are keyed aggregates —
  * max by (query vector, group), then sum by group. No corpus self-join,
  * no per-group collect of corpus rows.
  *
  * Determinism: the final per-group sum folds the per-query maxima IN
  * QUERY-ID ORDER (sort_array ∘ collect_list ∘ sequential fold) — a plain
  * SUM over doubles would be partition-order-dependent and break
  * hash-exact oracle replay. The fold is over |query| values per group,
  * bounded and tiny. */
object MultiVector {

  /** Score every `groupCol` group of `corpus` against the query set.
    *
    * @param queries  (qidCol, qvecCol) — the query's vectors; must be
    *                 small enough to broadcast (it is the "text" of one
    *                 query)
    * @param corpus   (groupCol, vecCol) — candidate vectors, grouped
    * @param metric   similarity = 1 - metricDistance for "cosine" (the
    *                 usual MaxSim setting); any metric's NEGATED distance
    *                 works as a similarity for ranking
    * @return (groupCol, maxsim_score DOUBLE, n_query BIGINT) */
  def maxSimScores(queries: DataFrame, qidCol: String, qvecCol: String,
      corpus: DataFrame, groupCol: String, vecCol: String,
      metric: String = "cosine"): DataFrame = {
    val sim = metric match {
      case "cosine" =>
        (q: Column, d: Column) =>
          lit(1.0) - graft.functions.vector.array_cosine_distance(q, d)
      case m =>
        (q: Column, d: Column) =>
          -graft.functions.vector.metricDistance(m)(q, d)
    }
    val q = queries.select(col(qidCol).as("__qid"), col(qvecCol).as("__qv"))
      .where(col("__qv").isNotNull)
    val scored = corpus.where(col(vecCol).isNotNull)
      .join(broadcast(q))
      .select(col(groupCol), col("__qid"),
        sim(col("__qv"), col(vecCol)).as("__sim"))
      .groupBy(col(groupCol), col("__qid"))
      .agg(max(col("__sim")).as("__best"))
    scored
      .groupBy(col(groupCol))
      .agg(
        aggregate(
          transform(
            sort_array(collect_list(struct(col("__qid"), col("__best")))),
            s => s.getField("__best")),
          lit(0.0), (acc, x) => acc + x).as("maxsim_score"),
        count(lit(1)).as("n_query"))
  }
}
