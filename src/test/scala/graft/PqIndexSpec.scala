package graft

import org.apache.spark.sql.functions._
import graft.index.PqIndex

class PqIndexSpec extends GraftSparkSpec {
  import spark.implicits._

  private def embeddings = {
    spark.read.parquet(s"$sfDir/embeddings.parquet")
      .createOrReplaceTempView("pq_emb")
    spark.table("pq_emb")
  }

  private def queryVec(id: Long): Array[Float] =
    embeddings.where($"vec_id" === id).select($"embedding")
      .head().getSeq[Float](0).toArray

  private def bruteTopK(q: Array[Float], k: Int): Seq[Long] =
    Graft.topK(embeddings, "embedding", q, k, "l2sq", Seq("vec_id"))
      .select($"vec_id").as[Long].collect().toSeq

  test("full-refine PQ search is exactly brute force (the oracle contract)") {
    embeddings
    PqIndex.drop("pq_exact")
    PqIndex.create(spark, "pq_exact", "pq_emb", "vec_id", "embedding", m = 8, k = 16)
    val q = queryVec(3)
    val got = PqIndex.search(spark, "pq_exact", q, 10, refine = 1000, tieBreak = Seq("vec_id"))
      .select($"vec_id").as[Long].collect().toSeq
    assert(got == bruteTopK(q, 10))
    PqIndex.drop("pq_exact")
  }

  test("default-refine ADC recall@10 is high; codes are m bytes") {
    embeddings
    PqIndex.drop("pq_recall")
    val e = PqIndex.create(spark, "pq_recall", "pq_emb", "vec_id", "embedding",
      m = 8, k = 64)
    // compression contract: the stored code row is exactly m bytes
    val codes = spark.read.parquet(e.path)
      .select(length(col(PqIndex.CodesCol))).as[Int].head()
    assert(codes == 8, s"expected 8-byte codes, got $codes")
    val qs = Seq(0L, 7L, 11L, 42L, 99L)
    val recalls = qs.map { id =>
      val q = queryVec(id)
      val exact = bruteTopK(q, 10).toSet
      val approx = PqIndex.search(spark, "pq_recall", q, 10, refine = 8,
        tieBreak = Seq("vec_id")).select($"vec_id").as[Long].collect().toSet
      (approx intersect exact).size / 10.0
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.8, s"mean ADC recall@10 too low: $mean ($recalls)")
    PqIndex.drop("pq_recall")
  }

  test("train rejects cosine and non-divisible subspace counts") {
    embeddings
    val err = intercept[IllegalArgumentException] {
      PqIndex.train(spark.table("pq_emb"), "embedding", m = 8, k = 16, metric = "cosine")
    }
    assert(err.getMessage.contains("normalize"))
    intercept[IllegalArgumentException] {
      PqIndex.train(spark.table("pq_emb"), "embedding", m = 7, k = 16, metric = "l2sq")
    }
  }

  test("create is deterministic for a fixed seed (same codebooks twice)") {
    embeddings
    val a = PqIndex.train(spark.table("pq_emb"), "embedding", 4, 8, "l2sq", seed = 7L)
    val b = PqIndex.train(spark.table("pq_emb"), "embedding", 4, 8, "l2sq", seed = 7L)
    assert(a.books.flatten.flatten.toSeq == b.books.flatten.flatten.toSeq)
  }
}
