package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The index-path oracle queries (q16/q17/q27/q35/q36) rank by distance
  * alone; the DuckDB oracles tie-break by nid and the index by rowid. The
  * rewrite preconditions don't allow a secondary sort key (TopN must stay a
  * single-dist ORDER BY for the rule to fire), so parity rests on the
  * fixture property this spec pins at the DRIVER's sf (0.01): for every
  * query vector those queries use, the top-(k+1) distances are pairwise
  * distinct — any tie would have to reorder equal-distance rows to flake,
  * and none can exist. A fixture regeneration that violates this fails HERE
  * with a readable message instead of as an oracle hash mismatch. */
class FixtureTieBreakSpec extends AnyFunSuite {

  test("sf0.01 fixture: distinct top-k distances for every index-path query vector") {
    val spark = TestSpark.spark
    import spark.implicits._
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
      .where($"embedding".isNotNull)
      .select($"vec_id", $"embedding")
    // q16 uses vec 0; q35 vec 7; q17/q27 outers vec_id < 5; q36 outers
    // 5 <= vec_id < 10; q34 outers vec_id < 20 (k up to 10 → check top 12)
    val queryIds = (0L until 20L)
    val queries = emb.where($"vec_id" < 20).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toMap
    val all = emb.collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    queryIds.foreach { qid =>
      val q = queries(qid)
      val top = all.map { case (id, v) =>
        var d = 0.0
        var i = 0
        while (i < v.length) {
          val t = v(i).toDouble - q(i).toDouble; d += t * t; i += 1
        }
        (d, id)
      }.sortBy(_._1).take(12)
      val dists = top.map(_._1)
      assert(dists.distinct.length == dists.length,
        s"query vec $qid has tied top-12 distances — oracle tie-break order " +
          s"is no longer guaranteed: ${top.mkString(", ")}")
    }
  }
}
