package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.operators.VssJoins

class VssJoinsSpec extends GraftSparkSpec {
  import spark.implicits._

  // F5 fixture shape: 729-grid t1 + tiny s (hnsw_join_macro.test:3-16)
  private lazy val grid = {
    val rows = for { a <- 1 to 9; b <- 1 to 9; c <- 1 to 9 }
      yield ((a - 1) * 81 + (b - 1) * 9 + c, Array(a.toFloat, b.toFloat, c.toFloat))
    rows.toDF("id", "vec")
  }
  private lazy val s = Seq(
    (1, Array(5f, 5f, 5f)), (2, Array(1f, 1f, 1f))).toDF("sid", "s_vec")

  test("vssJoin: k best grid points per query vector, rank 1-indexed") {
    val out = VssJoins.vssJoin(s, grid, "s_vec", "vec", 3)
    val got = out.select($"left_tbl.sid", $"right_tbl.id", $"score", $"rank")
      .orderBy($"sid", $"rank").collect()
    assert(got.length == 6)
    // query [5,5,5] → exact hit (id for a=b=c=5): (4*81 + 4*9 + 5) = 365
    assert(got.head == Row(1, 365, 0.0, 1L))
    // query [1,1,1] → exact hit id 1
    assert(got(3) == Row(2, 1, 0.0, 1L))
    assert(got.map(_.getLong(3)).toSeq == Seq(1L, 2L, 3L, 1L, 2L, 3L))
  }

  test("vssJoin agrees with a window-function formulation") {
    // reference macro contract: l2sq metric scores with array_distance (√)
    val wdf = s.crossJoin(grid)
      .withColumn("score", graft.functions.vector.array_distance($"s_vec", $"vec"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"sid").orderBy($"score", $"id")))
      .filter($"rn" <= 3)
      .select($"sid", $"id", $"score").orderBy($"sid", $"score", $"id")
    val got = VssJoins.vssJoin(s, grid, "s_vec", "vec", 3)
      .select($"left_tbl.sid", $"right_tbl.id", $"score")
      .orderBy($"sid", $"score", col("id"))
    assert(got.collect().toSeq == wdf.collect().toSeq)
  }

  test("vssMatch: matches array of k {score,row} structs, best first") {
    val out = VssJoins.vssMatch(s, grid.select($"id", $"vec"), "s_vec", "vec", 2)
    val m = out.orderBy($"left_tbl.sid").select($"matches").collect()
    assert(m.length == 2)
    val first = m.head.getSeq[Row](0)
    assert(first.length == 2)
    assert(first.head.getDouble(0) == 0.0) // score of exact hit
    assert(first.head.getStruct(1).getInt(0) == 365)
  }

  test("NULL vectors on either side never match (reference NULL semantics)") {
    val sWithNull = Seq((1, Option(Array(5f, 5f, 5f))), (2, None)).toDF("sid", "s_vec")
    val gridWithNull = Seq((1, Option(Array(1f, 1f, 1f))), (2, None)).toDF("id", "vec")
    val out = VssJoins.vssJoin(sWithNull, gridWithNull, "s_vec", "vec", 5)
    val got = out.select($"left_tbl.sid", $"right_tbl.id").collect()
    assert(got.toSeq == Seq(Row(1, 1))) // only non-null pair survives
  }

  test("cosine metric variant scores with SIMILARITY and keeps the k max") {
    val out = VssJoins.vssJoin(s, grid, "s_vec", "vec", 1, metric = "cosine")
    val got = out.select($"left_tbl.sid", $"score").orderBy($"sid").as[(Int, Double)].collect()
    // [5,5,5] and [1,1,1] are colinear with grid diagonal → similarity 1
    // (reference macro scores cosine with array_cosine_similarity via max_by)
    assert(got.forall(p => math.abs(1.0 - p._2) < 1e-12))
  }

  test("ip metric scores with raw inner product, k largest first") {
    val out = VssJoins.vssJoin(s, grid, "s_vec", "vec", 3, metric = "ip")
    val scores = out.filter($"left_tbl.sid" === 1)
      .orderBy($"rank").select($"score").as[Double].collect()
    // best-first for ip = largest inner product first; grid max is [9,9,9]
    assert(scores.length == 3 && scores.head == 135.0) // 5*9*3
    assert(scores.sameElements(scores.sorted.reverse))
  }
}
