package graft

/** Plan-shape regression guards: the properties that make these queries
  * scale (pushdown, pruning, broadcast) asserted on the optimized plans,
  * so a refactor that silently degrades the plan fails loudly.
  */
class PlanQualitySpec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"
  private def planOf(name: String): String = {
    val df = SparkEntry.queries(name)(spark, dir)
    df.queryExecution.executedPlan.toString
  }

  test("s2 incremental scan: watermark predicate pushed to parquet") {
    val p = planOf("s2_scan_incremental")
    assert(p.contains("PushedFilters") && p.contains("GreaterThan(event_id"), p.take(800))
  }

  test("flagship join: dimension side broadcast, no sort-merge") {
    val p = planOf("q1_flagship")
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(!p.contains("SortMergeJoin"), p.take(800))
  }

  test("flagship scan: column pruning reads only needed lineitem columns") {
    val p = planOf("q1_flagship")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_shipdate"), readSchema)
  }

  test("star revenue: all three dimension joins broadcast") {
    val p = planOf("q_star_revenue")
    val n = "BroadcastHashJoin".r.findAllIn(p).length
    assert(n >= 3, s"expected >=3 broadcast joins, got $n")
  }

  test("aggregate uses map-side partial aggregation") {
    val p = planOf("a1_multi_agg")
    assert(p.contains("partial_sum") || p.contains("HashAggregate"), p.take(800))
  }
}
