package graft.queries

import graft.{SparkSpec, Tables}

/** Plan contracts for the round-9 disjunctive anchors: the whole point of
  * their split formulations is WHERE the predicates land, so pin that.
  */
class BracketJoinPlanSpec extends SparkSpec {

  private def finalSection(plan: String): String = {
    val i = plan.indexOf("== Final Plan ==")
    if (i < 0) plan
    else {
      val j = plan.indexOf("== Initial Plan ==", i)
      if (j < 0) plan.substring(i) else plan.substring(i, j)
    }
  }

  test("bracket disjunction: part-side union filter reaches the scan, fact never shuffles") {
    val df = AllQueries.all("q_join_bracket_disjunction").run(Tables(spark, sf("sf0.01")))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the brand/size union-of-brackets must prune the part SCAN (the split
    // formulation's reason to exist — the plain OR form pushes nothing)
    assert(plan.contains("EqualTo(p_brand,Brand#1)"),
      s"part bracket filter must reach the part scan:\n$plan")
    val fin = finalSection(plan)
    assert("BroadcastHashJoin".r.findAllIn(fin).nonEmpty,
      s"filtered part must broadcast:\n$fin")
    assert("SortMergeJoin".r.findAllIn(fin).isEmpty &&
      "ShuffledHashJoin".r.findAllIn(fin).isEmpty,
      s"lineitem must never shuffle for this join:\n$fin")
  }

  test("market share: part/region filters reach their scans, one fact shuffle") {
    val df = AllQueries.all("q_join_market_share").run(Tables(spark, sf("sf0.01")))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("EqualTo(p_type,PROMO)"),
      s"part type filter must reach the part scan:\n$plan")
    assert(plan.contains("EqualTo(r_name,EUROPE)"),
      s"region filter must reach the region scan:\n$plan")
    assert(plan.contains("GreaterThanOrEqual(o_orderdate"),
      s"orders date pruning must reach the scan:\n$plan")
    val fin = finalSection(plan)
    val shuffles = "SortMergeJoin".r.findAllIn(fin).size +
      "ShuffledHashJoin".r.findAllIn(fin).size
    assert(shuffles <= 2,
      s"only the lineitem-orders and customer edges may shuffle (got $shuffles):\n$fin")
  }
}
