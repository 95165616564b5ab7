package graft.queries

import graft.{SparkSpec, Tables}

/** Plan contract for q_win_running_distinct: the first-occurrence-flag +
  * running-sum rewrite must cost exactly its stated exchanges — one per
  * window partition key (user_id, event_type) then (user_id), plus the
  * final presentation sort's range exchange — and both windows must be
  * real Window nodes (a regression to a per-frame distinct aggregate
  * would either fail analysis or explode the plan).
  */
class RunningDistinctPlanSpec extends SparkSpec {

  test("two window nodes and no more than three exchanges") {
    val df = AllQueries.all("q_win_running_distinct").run(Tables(spark, sf()))
    val plan = df.queryExecution.executedPlan.toString
    val windows = "\\bWindow\\b".r.findAllIn(plan).size
    assert(windows == 2, s"expected exactly 2 Window nodes, got $windows:\n$plan")
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges <= 3,
      s"rewrite must cost at most 3 exchanges (2 windows + output sort), got $exchanges:\n$plan")
  }
}
