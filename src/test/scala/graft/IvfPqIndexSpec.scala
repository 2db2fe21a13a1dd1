package graft

import org.apache.spark.sql.functions._
import graft.index.{IvfPqIndex, PqIndex}

class IvfPqIndexSpec extends GraftSparkSpec {
  import spark.implicits._

  private def embeddings = {
    spark.read.parquet(s"$sfDir/embeddings.parquet")
      .createOrReplaceTempView("ivfpq_emb")
    spark.table("ivfpq_emb")
  }

  private def queryVec(id: Long): Array[Float] =
    embeddings.where($"vec_id" === id).select($"embedding")
      .head().getSeq[Float](0).toArray

  private def bruteTopK(q: Array[Float], k: Int): Seq[Long] =
    Graft.topK(embeddings, "embedding", q, k, "l2sq", Seq("vec_id"))
      .select($"vec_id").as[Long].collect().toSeq

  test("nProbe=nLists + full refine is exactly brute force; probing prunes partitions") {
    embeddings
    IvfPqIndex.drop("ivfpq_t")
    val e = IvfPqIndex.create(spark, "ivfpq_t", "ivfpq_emb", "vec_id", "embedding",
      nLists = 4, m = 8, k = 16)
    val q = queryVec(5)
    val exact = IvfPqIndex.search(spark, "ivfpq_t", q, 10, nProbe = 4,
      refine = 1000, tieBreak = Seq("vec_id")).select($"vec_id").as[Long].collect().toSeq
    assert(exact == bruteTopK(q, 10))

    // the pruned candidate scan must hit only the probed partition's files
    val one = spark.read.parquet(e.path).where(col(IvfPqIndex.ListCol) === 0)
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), s"expected partition pruning:\n$plan")

    // approximate settings still find most of the true top-k
    val approx = IvfPqIndex.search(spark, "ivfpq_t", q, 10, nProbe = 2,
      refine = 8, tieBreak = Seq("vec_id")).select($"vec_id").as[Long].collect().toSet
    val recall = (approx intersect bruteTopK(q, 10).toSet).size / 10.0
    assert(recall >= 0.5, s"nProbe=2/4 recall collapsed: $recall")
    IvfPqIndex.drop("ivfpq_t")
  }

  test("codes-only storage: the index artifact holds id + list + m bytes, no vectors") {
    embeddings
    IvfPqIndex.drop("ivfpq_s")
    val e = IvfPqIndex.create(spark, "ivfpq_s", "ivfpq_emb", "vec_id", "embedding",
      nLists = 4, m = 8, k = 16)
    val stored = spark.read.parquet(e.path)
    assert(stored.columns.toSet == Set("vec_id", PqIndex.CodesCol, IvfPqIndex.ListCol))
    assert(stored.select(max(length(col(PqIndex.CodesCol)))).as[Int].head() == 8)
    IvfPqIndex.drop("ivfpq_s")
  }
}
