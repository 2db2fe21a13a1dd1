package graft

/** The driver's oracle compares only RESULTS; these assertions pin that the
  * index-path queries in SparkEntry actually execute through the engine's
  * index operators (a silent fall-back to brute force would still pass the
  * oracle — the plan shape is the point, mirroring the reference's EXPLAIN
  * assertions in test/sql/hnsw/hnsw_basic.test:19-22). */
class SparkEntryIndexPathSpec extends GraftSparkSpec {

  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.queryExecution.executedPlan.toString
  }

  test("q16_index_topk executes through HnswIndexScan") {
    val p = plan("q16_index_topk")
    assert(p.contains("HnswIndexScan"), p)
  }

  test("q17_index_knn_join executes through HnswKnnJoin") {
    val p = plan("q17_index_knn_join")
    assert(p.contains("HnswKnnJoin"), p)
  }

  test("q19_index_crud's final fetch is an index search result join") {
    // indexTopK is the guaranteed index path: the driver-side search feeds a
    // broadcast rowid join; no full-table sort appears in the plan
    val p = plan("q19_index_crud")
    assert(!p.contains("TakeOrderedAndProject") || p.contains("BroadcastHashJoin"), p)
  }
}
