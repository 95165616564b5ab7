package graft.queries

import graft.{SparkSpec, Tables}

/** Plan contract for q_layout_pruning: the OR-of-dims probe join runs as a
  * broadcast nested loop over the 16-row literal probe frame against the
  * 96-row envelope manifest — post-aggregate work, nothing data-sized —
  * and must never degrade to a non-broadcast cartesian product.
  */
class LayoutPruningPlanSpec extends SparkSpec {

  test("probe join is a broadcast nested loop, not a cartesian product") {
    val df = AllQueries.all("q_layout_pruning").run(Tables(spark, sf()))
    df.collect() // finalize AQE decisions
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"probe join must broadcast the literal probe frame:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"no cartesian product may appear:\n$plan")
  }
}
