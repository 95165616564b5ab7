package graft.queries

import graft.{Graft, SparkSpec}
import org.apache.spark.sql.functions._

/** Proof obligations for q_agg_hll_merge (rows-only under the DuckDB oracle
  * — Datasketches HLL buffers are engine-specific, same class as
  * q_agg_approx_distinct):
  *
  * 1. MERGE ASSOCIATIVITY — the estimate of the UNION of per-group sketches
  *    equals the estimate of one sketch built over the whole input in a
  *    single pass. This is the contract that makes the operator a 100 TB
  *    pattern: partial sketches built independently per executor/day/
  *    partition can be merged in any grouping without changing the answer.
  * 2. ACCURACY — every per-group estimate and the merged global estimate
  *    are within 5% of the exact distinct count (lgConfigK=12 ⇒ rsd ≈ 1.6%,
  *    so 5% is a stable margin, not a tuned one).
  */
class HllMergeSpec extends SparkSpec {

  test("union of per-group sketches estimates exactly like one global sketch") {
    val ev = Graft.table(spark, sf("sf0.01"), "events")

    val mergedEst = ev
      .groupBy(col("event_type"))
      .agg(hll_sketch_agg(col("user_id"), 12).as("sketch"))
      .agg(hll_union_agg(col("sketch")).as("u"))
      .select(hll_sketch_estimate(col("u")).as("est"))
      .head().getLong(0)

    val directEst = ev
      .agg(hll_sketch_agg(col("user_id"), 12).as("sketch"))
      .select(hll_sketch_estimate(col("sketch")).as("est"))
      .head().getLong(0)

    assert(mergedEst === directEst,
      s"merge-of-partials ($mergedEst) must equal the single-pass sketch ($directEst)")
  }

  test("per-group and merged estimates within 5% of exact") {
    val ev = Graft.table(spark, sf("sf0.01"), "events")

    val perGroup = ev.groupBy(col("event_type"))
      .agg(
        countDistinct(col("user_id")).as("exact"),
        hll_sketch_estimate(hll_sketch_agg(col("user_id"), 12)).as("approx"))
      .collect()
    assert(perGroup.nonEmpty)
    perGroup.foreach { r =>
      val exact = r.getAs[Long]("exact").toDouble
      val approx = r.getAs[Long]("approx").toDouble
      assert(math.abs(approx - exact) / exact <= 0.05,
        s"${r.getAs[String]("event_type")}: exact=$exact approx=$approx")
    }

    val exactAll = ev.select(countDistinct(col("user_id"))).head().getLong(0).toDouble
    val mergedAll = ev.groupBy(col("event_type"))
      .agg(hll_sketch_agg(col("user_id"), 12).as("sketch"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch"))).as("est"))
      .head().getLong(0).toDouble
    assert(math.abs(mergedAll - exactAll) / exactAll <= 0.05,
      s"global: exact=$exactAll merged=$mergedAll")
  }
}
