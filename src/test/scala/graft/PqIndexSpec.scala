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

  test("ragged codebooks (subspace with fewer distinct values than k) pad safely") {
    // subspace 0 is CONSTANT (1 distinct value), subspace 1 varies: lloyd
    // caps book 0 at one centroid while book 1 gets k — the ADC stride must
    // survive the raggedness and full-refine stays exact
    val df = spark.range(0, 60).select($"id".as("vid"),
      array(lit(1.0f), lit(1.0f),
        ($"id" % 13).cast("float"), ($"id" % 7).cast("float")).as("v"))
    df.createOrReplaceTempView("pq_ragged")
    PqIndex.drop("pq_ragged_idx")
    val e = PqIndex.create(spark, "pq_ragged_idx", "pq_ragged", "vid", "v",
      m = 2, k = 8)
    assert(e.codebooks.books.forall(_.length == e.codebooks.k),
      "books must be padded to a uniform k")
    val q = Array(1.0f, 1.0f, 5.0f, 3.0f)
    val got = PqIndex.search(spark, "pq_ragged_idx", q, 5, refine = 100,
        tieBreak = Seq("vid"))
      .select($"vid").as[Long].collect().toSeq
    val brute = Graft.topK(spark.table("pq_ragged"), "v", q, 5, "l2sq", Seq("vid"))
      .select($"vid").as[Long].collect().toSeq
    assert(got == brute)
    PqIndex.drop("pq_ragged_idx")
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
