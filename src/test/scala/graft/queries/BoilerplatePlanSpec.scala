package graft.queries

import graft.{SparkSpec, Tables}

/** AQE plan contract for `q_dedup_boilerplate`: the heavy-hitter relation
  * (segments with corpus frequency >= T) is small by construction — repeated
  * mass concentrates on few distinct segments — so the anti-join that
  * removes boilerplate from the exploded corpus must come back as a
  * runtime BroadcastHashJoin, not a second corpus-wide shuffle pair. The
  * plan's only corpus shuffles are the partial-agg'd frequency count and
  * the by-doc regroup; a sort-merge anti-join would add exchange + sort
  * over every segment of every document — the shape that dies at 100 TB.
  */
class BoilerplatePlanSpec extends SparkSpec {

  test("AQE broadcasts the heavy-hitter anti-join at gated scale") {
    val df = AllQueries.all("q_dedup_boilerplate").run(Tables(spark, sf("sf0.01")))
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
    assert(finalSection.contains("BroadcastHashJoin") &&
      finalSection.contains("LeftAnti"),
      s"expected a runtime broadcast anti-join against the boilerplate set:\n$finalSection")
    assert(!finalSection.contains("SortMergeJoin"),
      s"the boilerplate anti-join must not degrade to sort-merge:\n$finalSection")
  }
}
