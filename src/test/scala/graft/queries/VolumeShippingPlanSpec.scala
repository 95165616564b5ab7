package graft.queries

import graft.{SparkSpec, Tables}

/** Plan contract for the two-alias dimension join `q_join_volume_shipping`
  * (TPC-H Q7 shape): the date pruning must reach the lineitem scan, the
  * nation-pair filter must be applied on BOTH dim aliases BEFORE their
  * joins (the disjunctive pair predicate must not survive as a post-join
  * OR), and the final adaptive plan must keep exactly one fact-fact
  * sort-merge/shuffle join (lineitem↔orders) with every other edge
  * broadcast — the shape that still works when lineitem is 100 TB.
  */
class VolumeShippingPlanSpec extends SparkSpec {

  test("date filter reaches the scan; one fact shuffle; dims broadcast") {
    val df = AllQueries.all("q_join_volume_shipping").run(Tables(spark, sf("sf0.01")))
    df.collect() // AQE finalizes join strategies only at runtime
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThanOrEqual(l_shipdate"),
      s"shipdate pruning must reach the lineitem scan:\n$plan")
    // nation-pair filter pushed into both nation scans (two filtered aliases)
    val nationIn = "In\\(n_name".r.findAllIn(plan).size
    assert(nationIn >= 2,
      s"both nation aliases must be pre-filtered at their scans (got $nationIn):\n$plan")
    val finalSection = {
      val i = plan.indexOf("== Final Plan ==")
      if (i < 0) plan
      else {
        val j = plan.indexOf("== Initial Plan ==", i)
        if (j < 0) plan.substring(i) else plan.substring(i, j)
      }
    }
    val bhj = "BroadcastHashJoin".r.findAllIn(finalSection).size
    assert(bhj >= 3,
      s"supplier+nation, customer+nation, and the supp edge must broadcast (got $bhj):\n$finalSection")
    val smj = "SortMergeJoin".r.findAllIn(finalSection).size +
      "ShuffledHashJoin".r.findAllIn(finalSection).size
    assert(smj <= 1,
      s"at most the lineitem-orders edge may shuffle (got $smj):\n$finalSection")
  }
}
