package graft

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll

import graft.index.SqIndex

class SqIndexSpec extends GraftSparkSpec with BeforeAndAfterAll {
  import spark.implicits._

  override def beforeAll(): Unit = {
    SqIndex.clear()
    spark.read.parquet(s"$sfDir/embeddings.parquet")
      .createOrReplaceTempView("sq_emb")
    SqIndex.create(spark, "sq1", "sq_emb", "vec_id", "embedding")
  }
  override def afterAll(): Unit = SqIndex.clear()

  private def queryVec(id: Int): Array[Float] =
    spark.table("sq_emb").filter($"vec_id" === id)
      .select($"embedding").head().getSeq[Float](0).toArray

  test("full refine is exact (matches brute force)") {
    val q = queryVec(3)
    val brute = spark.table("sq_emb")
      .withColumn("dist", graft.functions.vector.array_distance_sq($"embedding", lit(q)))
      .orderBy($"dist", $"vec_id").limit(10).select($"vec_id").as[Long].collect()
    val viaSq = SqIndex.search(spark, "sq1", q, 10,
        refine = Int.MaxValue / 16, tieBreak = Seq("vec_id"))
      .orderBy($"dist", $"vec_id").select($"vec_id").as[Long].collect()
    assert(viaSq.toSeq == brute.toSeq)
  }

  test("codes are one byte per dimension; every vector is encoded") {
    val entry = SqIndex.get("sq1").get
    val dim = entry.ranges.dim
    val codes = spark.read.parquet(entry.path)
    assert(codes.count() == spark.table("sq_emb").count())
    val lens = codes.select(length(col(SqIndex.CodesCol))).distinct()
      .as[Int].collect().toSeq
    assert(lens == Seq(dim))
  }

  test("low-refine ADC search still finds the query's own vector first") {
    (0 until 10).foreach { i =>
      val id = i * 11 % 100
      val q = queryVec(id)
      val top = SqIndex.search(spark, "sq1", q, 1, refine = 2,
          tieBreak = Seq("vec_id"))
        .select($"vec_id").as[Long].collect()
      assert(top.headOption.contains(id.toLong), s"query vec_id=$id got ${top.toSeq}")
    }
  }

  test("approximate recall@10 at refine=3 is high (int8 error is small)") {
    var hits = 0
    (0 until 10).foreach { qi =>
      val q = queryVec(qi * 7 % 100)
      val brute = spark.table("sq_emb")
        .withColumn("dist", graft.functions.vector.array_distance_sq($"embedding", lit(q)))
        .orderBy($"dist", $"vec_id").limit(10).select($"vec_id").as[Long].collect().toSet
      val approx = SqIndex.search(spark, "sq1", q, 10, refine = 3)
        .select($"vec_id").as[Long].collect().toSet
      hits += brute.intersect(approx).size
    }
    assert(hits >= 90, s"recall@10 over 10 queries was $hits/100")
  }

  test("cosine is rejected with normalization guidance; duplicate name errors; drop clears") {
    val ex = intercept[IllegalArgumentException] {
      SqIndex.create(spark, "sq_cos", "sq_emb", "vec_id", "embedding", metric = "cosine")
    }
    assert(ex.getMessage.contains("L2-normalize"))
    assertThrows[IllegalArgumentException] {
      SqIndex.create(spark, "sq1", "sq_emb", "vec_id", "embedding")
    }
    SqIndex.create(spark, "sq_tmp", "sq_emb", "vec_id", "embedding")
    val path = SqIndex.get("sq_tmp").get.path
    assert(SqIndex.drop("sq_tmp"))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(path)))
    assert(!SqIndex.drop("sq_tmp"))
  }
}
