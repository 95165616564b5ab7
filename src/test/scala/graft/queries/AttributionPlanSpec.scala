package graft.queries

import graft.{SparkSpec, Tables}

/** Plan contracts for the attribution anchors. Both models must touch the
  * event stream ONCE: last-touch is a single window pass, and linear
  * multi-touch runs BOTH running counters in the same window frame — one
  * scan, one user_id exchange, one Window node — never the per-model or
  * per-counter re-shuffle the quadratic oracle formulation implies. A
  * regression that splits the counters into differently-framed windows
  * would double the sort without changing results; this pins it.
  */
class AttributionPlanSpec extends SparkSpec {

  private def planOf(name: String): String =
    AllQueries.all(name).run(Tables(spark, sf("sf0.001")))
      .queryExecution.executedPlan.toString

  test("linear attribution: one events scan, one user shuffle, one window node") {
    val plan = planOf("q_events_attribution_linear")
    assert("events\\.parquet".r.findAllIn(plan).size == 1, s"events scanned twice:\n$plan")
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(plan).size == 1,
      s"expected exactly 1 user_id shuffle:\n$plan")
    assert("RunningWindowFunction|Window \\[".r.findAllIn(plan).size == 1,
      s"both counters must share one Window node:\n$plan")
  }

  test("last-touch attribution: one events scan and one user shuffle") {
    val plan = planOf("q_events_attribution")
    assert("events\\.parquet".r.findAllIn(plan).size == 1, s"events scanned twice:\n$plan")
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(plan).size == 1,
      s"expected exactly 1 user_id shuffle:\n$plan")
  }
}
