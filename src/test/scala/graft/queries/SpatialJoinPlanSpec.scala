package graft.queries

import graft.{SparkSpec, Tables}

/** Plan contract for the grid-blocked spatial radius join: the whole point
  * of the cell blocking is that the pair search compiles to a HASH join on
  * the packed cell id — never a cartesian/nested-loop product over the
  * point set (which is what Catalyst falls back to when an inequality-only
  * condition reaches the join). A regression that pushes the dist² check
  * into the join condition ahead of the cid equi-key would silently
  * quadratize the operator at scale; this pins it.
  */
class SpatialJoinPlanSpec extends SparkSpec {

  test("spatial radius join plans as a hash join on the cell id, no cartesian") {
    val plan = AllQueries.all("q_join_spatial_grid")
      .run(Tables(spark, sf("sf0.001")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cartesian product leaked:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"nested loop leaked:\n$plan")
    assert("HashJoin.*\\[cid".r.findFirstIn(plan).isDefined
      || plan.contains("hashpartitioning(cid"),
      s"expected the join keyed on cid:\n$plan")
  }
}
