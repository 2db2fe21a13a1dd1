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

  /** Filtered-ANN recall in TRUE graph mode: the known weak spot of
    * post-filter over-fetch is a selective predicate at modest ef. Measures
    * recall@5 of the over-fetch strategy (fetch m=k·fetchFactor graph
    * results, keep those passing a ~10% selective predicate) against the
    * exact filtered top-5. The escalation loop in indexTopKWhere recovers
    * the rest at exhaustive ef; this records what the FIRST probe delivers
    * at default ef — the evidence behind the fetchFactor guidance in
    * README's knob sheet. */
  test("filtered recall@5 at ef=64: first-probe over-fetch on a 10%-selective predicate") {
    val n = vectors.length
    val pass = (id: Long) => id % 10 == 3 // ~10% selectivity
    val queries = vectors.indices.by(40).map(vectors(_)._2)
    def recall(fetchFactor: Int): Double = {
      val scores = queries.map { q =>
        val exact = index.search(q, n, ef = n + 1).filter(h => pass(h._1))
          .take(5).map(_._1).toSet
        val probe = index.search(q, 5 * fetchFactor, ef = 64)
          .filter(h => pass(h._1)).take(5).map(_._1).toSet
        if (exact.isEmpty) 1.0 else exact.intersect(probe).size.toDouble / exact.size
      }
      scores.sum / scores.length
    }
    val r4 = recall(4)
    val r16 = recall(16)
    info(f"filtered recall@5 (10%% predicate, ef=64): fetchFactor=4 -> $r4%.3f, fetchFactor=16 -> $r16%.3f")
    // NOT asserted monotone: the wider fetch runs a different beam
    // (effective ef = max(ef, k·factor)), so superset-ness isn't an HNSW
    // invariant — only the headline claim, measured with wide margin, is
    assert(r16 >= 0.8, s"fetchFactor=16 first-probe recall was $r16")
  }
}
