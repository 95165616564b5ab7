package graft.queries

import graft.{SparkSpec, Tables}

/** Plan contract for the five-table star join `q_join_star` (r8 verdict
  * task 7): the selective filters must reach the parquet scans — a deep
  * chain that re-reads unfiltered fact tables is the plan that dies at
  * 100× — and the dimension chain must come in as broadcast joins in the
  * FINAL adaptive plan (the forced nation⋈region broadcast plus AQE's
  * runtime broadcast of the quarter-filtered orders side at gated scale).
  */
class StarJoinPlanSpec extends SparkSpec {

  test("selective filters are pushed to the scans and dims broadcast at runtime") {
    val df = AllQueries.all("q_join_star").run(Tables(spark, sf("sf0.01")))
    df.collect() // AQE finalizes join strategies only at runtime
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("EqualTo(l_returnflag,R)"),
      s"lineitem returnflag filter must reach the scan:\n$plan")
    assert(plan.contains("GreaterThanOrEqual(o_orderdate"),
      s"orders quarter filter must reach the scan:\n$plan")
    val finalSection = {
      val i = plan.indexOf("== Final Plan ==")
      if (i < 0) plan
      else {
        val j = plan.indexOf("== Initial Plan ==", i)
        if (j < 0) plan.substring(i) else plan.substring(i, j)
      }
    }
    val bhj = "BroadcastHashJoin".r.findAllIn(finalSection).size
    assert(bhj >= 2,
      s"expected the dim chain plus the filtered-orders edge to broadcast (got $bhj):\n$finalSection")
  }
}
