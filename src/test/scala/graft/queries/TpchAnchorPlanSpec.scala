package graft.queries

import graft.{SparkSpec, Tables}

/** Plan contracts for the round-9 TPC-H shape anchors (TpchAnchors.scala) —
  * the properties that make each shape survive a 100× scale-up, pinned so a
  * planner or refactor regression is caught at test time, not in the bench.
  */
class TpchAnchorPlanSpec extends SparkSpec {

  private def finalPlan(name: String): String = {
    val df = AllQueries.all(name).run(Tables(spark, sf("sf0.01")))
    df.collect() // AQE finalizes join strategies only at runtime
    val plan = df.queryExecution.executedPlan.toString
    val i = plan.indexOf("== Final Plan ==")
    if (i < 0) plan
    else {
      val j = plan.indexOf("== Initial Plan ==", i)
      if (j < 0) plan.substring(i) else plan.substring(i, j)
    }
  }

  test("Q4 shape: EXISTS plans as a LeftSemi join, date window reaches the orders scan") {
    val plan = finalPlan("q_join_order_priority")
    assert(plan.contains("LeftSemi"),
      s"the EXISTS must decorrelate to a semi join (no fan-out):\n$plan")
    assert(plan.contains("GreaterThanOrEqual(o_orderdate"),
      s"the date window must reach the orders scan as a pushed filter:\n$plan")
  }

  test("Q6 shape: no joins, every predicate at the scan, single-pass agg") {
    val plan = finalPlan("q_agg_revenue_delta")
    assert(!plan.contains("Join"), s"Q6 is join-free by construction:\n$plan")
    // The PushedFilters list renders truncated in executedPlan.toString, so
    // assert on the codegen Filter node's predicates (same conjuncts).
    assert("l_shipdate#\\d+ >= ".r.findFirstIn(plan).isDefined &&
      "l_quantity#\\d+ < 24".r.findFirstIn(plan).isDefined,
      s"shipdate window and quantity cap must prune the lineitem scan:\n$plan")
    assert(plan.contains("HashAggregate"),
      s"the global sum must partial-aggregate map-side:\n$plan")
  }

  test("Q13 shape: outer join survives with the status filter on the orders side only") {
    val plan = finalPlan("q_join_order_count_dist")
    assert(plan.contains("LeftOuter"),
      s"the zero-order customers must survive — join stays LeftOuter:\n$plan")
    assert(plan.contains("Not(EqualTo(o_orderstatus,F))"),
      s"the status predicate belongs on the orders scan, not the join output:\n$plan")
  }

  test("Q16 shape: blacklist excludes via LeftAnti before the distinct count") {
    val plan = finalPlan("q_join_supplier_cnt")
    assert(plan.contains("LeftAnti"),
      s"the NOT IN blacklist must plan as an anti join:\n$plan")
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2,
      s"part filter and blacklist are broadcast-sized dims:\n$plan")
  }

  test("Q9 shape: dims broadcast, at most the lineitem-orders edge shuffles") {
    val plan = finalPlan("q_join_product_profit")
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2,
      s"part (name filter) and supplier+nation must broadcast:\n$plan")
    val shuffled = "SortMergeJoin".r.findAllIn(plan).size +
      "ShuffledHashJoin".r.findAllIn(plan).size
    assert(shuffled <= 1,
      s"only the fact-fact lineitem-orders edge may shuffle (got $shuffled):\n$plan")
  }
}
