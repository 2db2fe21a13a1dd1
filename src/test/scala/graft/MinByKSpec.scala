package graft

import org.apache.spark.sql.functions._
import graft.functions.MinByK.{maxByK, minByK}

class MinByKSpec extends GraftSparkSpec {
  import spark.implicits._

  private val data = Seq(
    ("a", 1L, 3.0), ("a", 2L, 1.0), ("a", 3L, 2.0), ("a", 4L, 5.0),
    ("b", 5L, 9.0), ("b", 6L, 7.0),
    ("c", 7L, 0.5))

  test("min_by_k keeps the k smallest, best first") {
    val df = data.toDF("g", "id", "ord")
    val got = df.groupBy($"g").agg(minByK($"id", $"ord", 2).as("top"))
      .orderBy($"g").as[(String, Seq[Long])].collect()
    assert(got.toSeq == Seq(("a", Seq(2L, 3L)), ("b", Seq(6L, 5L)), ("c", Seq(7L))))
  }

  test("max_by_k keeps the k largest, best first") {
    val df = data.toDF("g", "id", "ord")
    val got = df.groupBy($"g").agg(maxByK($"id", $"ord", 2).as("top"))
      .orderBy($"g").as[(String, Seq[Long])].collect()
    assert(got.toSeq == Seq(("a", Seq(4L, 1L)), ("b", Seq(5L, 6L)), ("c", Seq(7L))))
  }

  test("partial aggregation across many partitions merges correctly") {
    val df = (1 to 10000).map(i => ((i % 7).toString, i.toLong, (i * 2654435761L % 100003).toDouble))
      .toDF("g", "id", "ord").repartition(16)
    val got = df.groupBy($"g").agg(minByK($"id", $"ord", 5).as("top"))
      .as[(String, Seq[Long])].collect().toMap
    // brute-force expected
    val expected = (1 to 10000).map(i => ((i % 7).toString, i.toLong, (i * 2654435761L % 100003).toDouble))
      .groupBy(_._1).map { case (g, rows) =>
        g -> rows.sortBy(r => (r._3, r._2)).take(5).map(_._2).toSeq
      }
    assert(got == expected)
  }

  test("NULL ordering values are ignored; struct values work") {
    val df = Seq((Some(1.0), "x"), (None, "y"), (Some(0.5), "z"))
      .toDF("ord", "v")
    val got = df.agg(minByK(struct($"v"), $"ord", 5).as("top")).select("top").collect()
    val vs = got.head.getSeq[org.apache.spark.sql.Row](0).map(_.getString(0))
    assert(vs == Seq("z", "x"))
  }

  test("ties on ord break deterministically by value") {
    val df = Seq((1.0, 9L), (1.0, 3L), (1.0, 7L), (2.0, 1L)).toDF("ord", "id")
      .repartition(4)
    val got = df.agg(minByK($"id", $"ord", 3).as("top")).as[Seq[Long]].head()
    assert(got == Seq(3L, 7L, 9L))
  }

  test("SQL surface min_by_k / max_by_k") {
    Graft.registerFunctions(spark)
    data.toDF("g", "id", "ord").createOrReplaceTempView("mbk_t")
    val r = spark.sql(
      "SELECT g, min_by_k(id, ord, 2) AS top FROM mbk_t GROUP BY g ORDER BY g")
      .as[(String, Seq[Long])].collect()
    assert(r.head == (("a", Seq(2L, 3L))))
  }
}
