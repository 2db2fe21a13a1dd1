package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import graft.functions.vector
import graft.functions.MinByK.minByK
import graft.index.IndexCatalog
import graft.plans.GraftExtensions

/** Mirrors the reference's differential test strategy
  * (test/sql/hnsw/hnsw_rewrite.test, hnsw_basic.test:19-22,
  * hnsw_lateral_join.test:36-43): plan-shape assertions via EXPLAIN plus
  * identical results with and without the index. */
class HnswRulesSpec extends GraftSparkSpec with BeforeAndAfterAll {
  import spark.implicits._

  override def beforeAll(): Unit = {
    GraftExtensions.install(spark)
    IndexCatalog.clear()
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    Graft.registerTable(spark, "rules_emb", emb)
    IndexCatalog.createIndex(spark, "rules_l2", "rules_emb", "embedding")
    // exhaustive ef → index results == brute force, so differentials are exact
    spark.conf.set(IndexCatalog.EfSearchConfKey, "600")
  }

  override def afterAll(): Unit = spark.conf.unset(IndexCatalog.EfSearchConfKey)

  private def queryVec(id: Int): Array[Float] =
    spark.table("rules_emb").filter($"vec_id" === id)
      .select($"embedding").head().getSeq[Float](0).toArray

  private def physicalPlan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("cosine canonicalization: 1.0 - similarity becomes distance (no index needed)") {
    // non-foldable inputs (parquet columns), else constant folding wins first
    val q = queryVec(0)
    val df = spark.table("rules_emb")
      .select((lit(1.0) - vector.array_cosine_similarity($"embedding", lit(q))).as("d"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("array_cosine_distance"), optimized)
    assert(!optimized.contains("array_cosine_similarity"), optimized)
    val df2 = spark.table("rules_emb")
      .select((-vector.array_inner_product($"embedding", lit(q))).as("d"))
    assert(df2.queryExecution.optimizedPlan.toString
      .contains("array_negative_inner_product"))
    // values unchanged by the rewrite
    val direct = spark.table("rules_emb")
      .select(vector.array_cosine_distance($"embedding", lit(q)).as("d"))
    assert(df.as[Double].collect().toSeq == direct.as[Double].collect().toSeq)
  }

  test("TopN over indexed table rewrites to HnswIndexScan and matches brute force") {
    val q = queryVec(0)
    val t = spark.table("rules_emb")
    // asc_nulls_last: DuckDB's ASC default and the rewrite's precondition
    // over a nullable column (NULL dists would sort first in Spark and the
    // index could not return them)
    val topk = t.select($"vec_id", $"embedding", col(Graft.RowIdCol))
      .withColumn("dist", vector.array_distance_sq($"embedding", lit(q)))
      .orderBy($"dist".asc_nulls_last).limit(7)
    assert(physicalPlan(topk).contains("HnswIndexScan"), physicalPlan(topk))

    val bruteForce = t
      .withColumn("dist", vector.array_distance_sq($"embedding", lit(q)))
      .orderBy($"dist", $"vec_id").limit(7)
      .select($"vec_id", $"dist").collect()
    val viaIndex = topk.select($"vec_id", $"dist").collect()
    assert(viaIndex.map(_.getLong(0)).toSet == bruteForce.map(_.getLong(0)).toSet)
  }

  test("metric mismatch prevents the rewrite (hnsw_metrics.test index selectivity)") {
    val q = queryVec(1)
    val cosineQuery = spark.table("rules_emb")
      .withColumn("dist", vector.array_cosine_distance($"embedding", lit(q)))
      .orderBy($"dist").limit(5)
    // only an l2sq index exists → no rewrite for a cosine query
    assert(!physicalPlan(cosineQuery).contains("HnswIndexScan"))

    IndexCatalog.createIndex(spark, "rules_cos", "rules_emb", "embedding",
      Map("metric" -> "cosine"))
    try {
      val again = spark.table("rules_emb")
        .withColumn("dist", vector.array_cosine_distance($"embedding", lit(q)))
        .orderBy($"dist".asc_nulls_last).limit(5)
      assert(physicalPlan(again).contains("HnswIndexScan"))
    } finally IndexCatalog.dropIndex("rules_cos")
  }

  test("k >= 2048 is not rewritten (reference STANDARD_VECTOR_SIZE bound)") {
    val q = queryVec(2)
    val big = spark.table("rules_emb")
      .withColumn("dist", vector.array_distance_sq($"embedding", lit(q)))
      .orderBy($"dist").limit(3000)
    assert(!physicalPlan(big).contains("HnswIndexScan"))
  }

  test("filter above indexed scan applies after candidate selection (filter pull-up)") {
    val q = queryVec(3)
    val filtered = spark.table("rules_emb")
      .withColumn("dist", vector.array_distance_sq($"embedding", lit(q)))
      .filter($"label" === 1 && $"embedding".isNotNull) // guard form of the precondition
      .orderBy($"dist").limit(5)
    // rewrite still fires with a Filter in the chain
    assert(physicalPlan(filtered).contains("HnswIndexScan"))
    // reference semantics: k candidates first, then filter ⇒ possibly short,
    // and every returned row satisfies the filter
    val rows = filtered.select($"label").as[Int].collect()
    assert(rows.length <= 5 && rows.forall(_ == 1))
  }

  test("min_by_k aggregate over indexed table rewrites and matches brute force") {
    val q = queryVec(4)
    val viaAgg = spark.table("rules_emb")
      .select($"vec_id", $"embedding", col(Graft.RowIdCol))
      .withColumn("dist", vector.array_distance_sq($"embedding", lit(q)))
      .agg(minByK($"vec_id", $"dist", 5).as("ids"))
    assert(physicalPlan(viaAgg).contains("HnswIndexScan"), physicalPlan(viaAgg))
    val ids = viaAgg.as[Seq[Long]].head()
    val brute = spark.table("rules_emb")
      .withColumn("dist", vector.array_distance_sq($"embedding", lit(q)))
      .orderBy($"dist", $"vec_id").limit(5).select($"vec_id").as[Long].collect()
    assert(ids == brute.toSeq)
  }

  test("windowed KNN-join pattern rewrites to HnswKnnJoin and matches the window plan") {
    // the isNotNull guard is required for the rewrite: parquet arrays are
    // nullable and NULL outer vectors would change results silently
    val outer = spark.table("rules_emb")
      .filter($"vec_id" < 4 && $"embedding".isNotNull)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val inner = spark.table("rules_emb")

    def windowed(df: DataFrame): DataFrame = df.crossJoin(inner)
      .withColumn("dist", vector.array_distance_sq($"qvec", $"embedding"))
      .withColumn("rn", row_number().over(
        Window.partitionBy($"qid").orderBy($"dist".asc_nulls_last)))
      .filter($"rn" <= 3)
      .select($"qid", $"vec_id", $"rn")

    val knn = windowed(outer)
    val plan = physicalPlan(knn)
    assert(plan.contains("HnswKnnJoin"), plan)

    val got = knn.orderBy($"qid", $"rn").collect().map(r => (r.getLong(0), r.getLong(1)))
    // differential vs the same query with no index available
    IndexCatalog.dropIndex("rules_l2")
    try {
      val brute = windowed(outer)
      assert(!physicalPlan(brute).contains("HnswKnnJoin"))
      val expected = brute.orderBy($"qid", $"rn").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(got.toSeq == expected.toSeq)
    } finally {
      IndexCatalog.createIndex(spark, "rules_l2", "rules_emb", "embedding")
    }
  }
}
