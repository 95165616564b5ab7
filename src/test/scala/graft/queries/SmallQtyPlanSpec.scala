package graft.queries

import graft.{SparkSpec, Tables}

/** Plan contract for `q_join_small_qty` (the Q17-shaped per-part-threshold
  * correlated aggregate). Two claims its scaladoc makes about the 100 TB
  * shape, pinned here so a planner regression is loud:
  *
  *  1. the brand/size-filtered `part` side reaches BOTH lineitem branches as
  *     a broadcast (the explicit hint must survive planning) — the fact is
  *     pruned before any exchange;
  *  2. the decorrelated per-part stats relation joins back WITHOUT a
  *     sort-merge join at gated scale: the aggregate shrinks its branch to
  *     one row per part, so AQE's final plan must carry that edge as a
  *     BroadcastHashJoin (and would degrade to a co-partitioned shuffle
  *     join, never an OOM, when parts outgrow the threshold).
  */
class SmallQtyPlanSpec extends SparkSpec {

  test("part prunes both branches via broadcast; stats join-back is AQE-broadcast") {
    val df = AllQueries.all("q_join_small_qty").run(Tables(spark, sf("sf0.01")))
    df.collect() // AQE finalizes join strategies only at runtime
    val plan = df.queryExecution.executedPlan.toString
    val finalSection = {
      val i = plan.indexOf("== Final Plan ==")
      if (i < 0) plan
      else {
        val j = plan.indexOf("== Initial Plan ==", i)
        if (j < 0) plan.substring(i) else plan.substring(i, j)
      }
    }
    val nBroadcastJoins =
      "BroadcastHashJoin".r.findAllMatchIn(finalSection).size
    // two part⋈lineitem edges (stats branch + probe branch) and the
    // stats join-back: all three must run as broadcast joins at sf0.01
    assert(nBroadcastJoins >= 3,
      s"expected the two part edges and the stats join-back as broadcasts:\n$finalSection")
    assert(!finalSection.contains("SortMergeJoin"),
      s"no edge of the Q17 shape may degrade to SMJ at gated scale:\n$finalSection")
  }
}
