package graft

/** Pins the plan-level properties the engine's scale story depends on —
  * a regression here silently turns a scalable plan into a scan-everything
  * plan long before any benchmark notices at test SF. */
class PlanAuditSpec extends GraftSparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan.toString

  test("q05: filters reach the parquet scan (PushedFilters non-empty)") {
    val p = plan("q05_selective_filter")
    assert(p.contains("PushedFilters: [IsNotNull"), p)
    // column pruning: only the referenced columns are read
    assert(p.contains("ReadSchema") && !p.contains("l_comment"), p)
  }

  test("q03: dimension join broadcasts, fact side streams") {
    val p = plan("q03_revenue_by_nation")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q01: aggregation is two-phase (map-side partial)") {
    val p = plan("q01_pricing_summary")
    assert("HashAggregate".r.findAllIn(p).length >= 2, p)
  }

  test("q02/q10: top-k plans as TakeOrderedAndProject, not global sort") {
    assert(plan("q02_top_orders").contains("TakeOrderedAndProject"))
    val p10 = plan("q10_knn_l2")
    assert(p10.contains("TakeOrderedAndProject"), p10)
  }

  test("q13: cross product never shuffles (broadcast NL join + bounded agg)") {
    val p = plan("q13_vss_join")
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    // the only wide ops: the k-bounded group-by and the output sort
    assert("Exchange hashpartitioning".r.findAllIn(p).length <= 1, p)
  }

  test("q21: text stats are a narrow transformation (no wide shuffle, one scan)") {
    val p = plan("q21_token_stats")
    // only the output sort repartitions; the stats themselves never shuffle
    assert(!p.contains("Exchange hashpartitioning"), p)
    assert("FileScan".r.findAllIn(p).length == 1, p)
  }
}
