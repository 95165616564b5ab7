package graft.queries

import graft.{SparkSpec, Tables}

/** AQE plan contract for `q_text_salient_terms` (r8 verdict task 5): round 8
  * dropped the forced broadcast on the vocabulary-sized document-frequency
  * relation, trusting AQE to pick a broadcast join at gated scale (and to
  * degrade to a shuffle join rather than OOM when the vocabulary is
  * corpus-sized). Nothing asserted the first half of that bet, so a silent
  * planner regression to a sort-merge join would have gone unnoticed. At
  * sf0.01 the df side is far below the adaptive broadcast threshold, so the
  * FINAL adaptive plan must carry the tf⋈df edge as a BroadcastHashJoin.
  */
class SalientTermsPlanSpec extends SparkSpec {

  test("AQE picks broadcast for the tf-df join at gated scale") {
    val df = AllQueries.all("q_text_salient_terms").run(Tables(spark, sf("sf0.01")))
    df.collect() // AQE finalizes join strategies only at runtime
    val plan = df.queryExecution.executedPlan.toString
    // the adaptive plan string carries both the final and the initial plan;
    // only the final section states what actually ran
    val finalSection = {
      val i = plan.indexOf("== Final Plan ==")
      if (i < 0) plan
      else {
        val j = plan.indexOf("== Initial Plan ==", i)
        if (j < 0) plan.substring(i) else plan.substring(i, j)
      }
    }
    assert(finalSection.contains("BroadcastHashJoin"),
      s"expected AQE to broadcast the vocabulary-side join at sf0.01:\n$finalSection")
    assert(!finalSection.contains("SortMergeJoin"),
      s"the tf-df join must not degrade to a sort-merge join at gated scale:\n$finalSection")
  }
}
