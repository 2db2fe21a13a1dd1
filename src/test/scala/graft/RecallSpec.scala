package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.index.HnswIndex

/** Recall of TRUE approximate search — the mode a real user runs (the
  * oracle queries all pin ef_search >= N, which exercises the exhaustive
  * path instead). Builds the graph with reference-default parameters
  * (M=16, ef_construction=128) over the sf0.1 embeddings and measures
  * recall@10 against exact brute force across the ef_search sweep the
  * reference documents. The measured curve is recorded in STATUS.md. */
class RecallSpec extends AnyFunSuite {

  private lazy val vectors: Array[(Long, Array[Float])] = {
    val spark = TestSpark.spark
    spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      .select("vec_id", "embedding")
      .where(org.apache.spark.sql.functions.col("embedding").isNotNull)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
  }

  private lazy val index: HnswIndex = {
    val idx = new HnswIndex(vectors.head._2.length, "l2sq")
    idx.addAll(vectors.iterator, numThreads = 4)
    idx
  }

  /** Mean recall@10 over every 20th vector as the query (100 queries at
    * sf0.1's 2000 rows). Exact baseline: ef >= N forces the linear scan. */
  private def recallAt10(ef: Int): Double = {
    val n = vectors.length
    val queries = vectors.indices.by(20).map(vectors(_)._2)
    val hits = queries.map { q =>
      val exact = index.search(q, 10, ef = n + 1).map(_._1).toSet
      val approx = index.search(q, 10, ef = ef).map(_._1).toSet
      exact.intersect(approx).size / 10.0
    }
    hits.sum / hits.length
  }

  test("recall@10 vs ef_search curve at sf0.1 (graph mode, not exhaustive)") {
    val curve = Seq(16, 64, 256).map(ef => ef -> recallAt10(ef))
    info(s"recall@10 by ef_search: ${curve.map { case (ef, r) => s"ef=$ef:${"%.3f".format(r)}" }.mkString(", ")}")
    val byEf = curve.toMap
    // monotone non-decreasing in ef, >= 0.9 at the reference default ef=64
    assert(byEf(16) <= byEf(64) + 1e-9 && byEf(64) <= byEf(256) + 1e-9)
    assert(byEf(64) >= 0.9, s"recall@10 at default ef_search=64 was ${byEf(64)}")
    assert(byEf(256) >= 0.97, s"recall@10 at ef_search=256 was ${byEf(256)}")
  }
}
