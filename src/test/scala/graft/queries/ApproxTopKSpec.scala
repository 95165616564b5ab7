package graft.queries

import graft.{Graft, SparkSpec}
import org.apache.spark.sql.functions._

/** approx_top_k (Spark 4.1, Datasketches frequent-items) — the heavy-hitter
  * twin of the HLL story (HllMergeSpec): corpus-wide top terms at 100 TB
  * are computed as per-partition/per-day SKETCHES that merge associatively
  * (accumulate → combine → estimate), not as a full-count shuffle. Two
  * proof obligations, same shape as the HLL ones:
  *
  * 1. MERGE ASSOCIATIVITY — estimating the combine of per-group
  *    accumulators equals estimating one whole-input accumulator.
  * 2. EXACTNESS IN CAPACITY — when distinct items fit the tracked capacity
  *    the sketch is not approximate at all: counts equal the exact
  *    groupBy-count answer (events has single-digit distinct event types,
  *    so this holds deterministically here).
  */
class ApproxTopKSpec extends SparkSpec {
  import spark.implicits._

  test("combine of per-group sketches estimates exactly like one global sketch") {
    Graft.table(spark, sf("sf0.01"), "events").createOrReplaceTempView("ev_topk")

    val merged = spark.sql(
      """SELECT approx_top_k_estimate(
        |         approx_top_k_combine(sk, 100), 5) AS est
        |FROM (SELECT approx_top_k_accumulate(event_type, 100) AS sk
        |      FROM ev_topk GROUP BY user_id % 8)""".stripMargin)
      .head().getSeq[Any](0)

    val direct = spark.sql(
      """SELECT approx_top_k_estimate(
        |         approx_top_k_accumulate(event_type, 100), 5) AS est
        |FROM ev_topk""".stripMargin)
      .head().getSeq[Any](0)

    assert(merged == direct,
      s"combine-of-partials must equal the single-pass sketch:\n$merged\nvs\n$direct")
  }

  test("within tracked capacity the top-k counts are exact") {
    val ev = Graft.table(spark, sf("sf0.01"), "events")
    ev.createOrReplaceTempView("ev_topk2")

    val approx = spark.sql(
      "SELECT approx_top_k(event_type, 5, 100) FROM ev_topk2")
      .head().getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getString(0), r.getLong(1)))

    val exact = ev.groupBy($"event_type").count()
      .orderBy($"count".desc, $"event_type")
      .as[(String, Long)].collect().take(5).toSeq

    assert(approx.toSet == exact.toSet,
      s"sketch within capacity must be exact: $approx vs $exact")
  }
}
