package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Contracts for `q_dedup_simhash_bands` (Manku et al. pigeonhole band
  * blocking for Hamming ≤ 2 over the 30-bit SimHash):
  *
  * 1. PLAN: the candidate stage must be the (band, value) equi-join —
  *    never a cartesian / broadcast-nested-loop product of documents
  *    (the quadratic shape the band split exists to avoid; the blocked
  *    baseline_dedup_simhash_pairs baseline is that labeled-quadratic twin).
  * 2. PIGEONHOLE BOUNDARY: with 3 bands, Hamming ≤ 2 is the exact
  *    guarantee line. The adversarial case is a pair whose 2 differing
  *    bits land in 2 DIFFERENT bands — only one band left identical, so
  *    a candidate from exactly one bucket. Synthetic simhash values pin:
  *    same-band-2-bit pairs (two identical bands), cross-band-2-bit
  *    pairs (one identical band), and 3-bit pairs spread across all
  *    bands (correctly rejected — no identical band, and over threshold
  *    anyway). The band pipeline must equal brute force exactly.
  *    (The sf0.01/sf0.1 oracle gate proves equivalence on real data;
  *    this pins the adversarial bit placements real data may not hit.)
  */
class SimhashBandsSpec extends SparkSpec {
  import spark.implicits._

  private def bandPairs(sims: org.apache.spark.sql.DataFrame) = {
    val bands = sims.select(col("doc_id"), col("sim"),
        explode(sequence(lit(0), lit(2))).as("bi"))
      .select(col("doc_id"), col("sim"), col("bi"),
        expr("shiftright(sim, CAST(bi * 10 AS INT)) & 1023").as("bv"))
    bands.as("x").join(bands.as("y"),
        col("x.bi") === col("y.bi") && col("x.bv") === col("y.bv") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        expr("bit_count(x.sim ^ y.sim)").cast("int").as("hamming"))
      .filter(col("hamming") <= 2)
      .distinct()
  }

  private def brutePairs(sims: org.apache.spark.sql.DataFrame) =
    sims.as("x").join(sims.as("y"), col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        expr("bit_count(x.sim ^ y.sim)").cast("int").as("hamming"))
      .filter(col("hamming") <= 2)

  test("candidate generation is a hash join, not a cartesian product") {
    val df = AllQueries.all("q_dedup_simhash_bands").run(Tables(spark, sf("sf0.001")))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"band blocking must not plan an all-pairs product:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"band blocking must not plan a nested-loop product:\n$plan")
  }

  test("band join equals brute force at the adversarial bit placements") {
    // Bands are bits [0,10), [10,20), [20,30). All docs sit near `base`,
    // so EMERGENT cross pairs at Hamming ≤ 2 exist beyond the constructed
    // ones — deliberate: the equality assertion then exercises pigeonhole
    // on arbitrary bit placements, while the named pairs pin the three
    // regimes the construction guarantees.
    val base = 0x15555555L & ((1L << 30) - 1)
    val sims = Seq(
      // pair (1,2): 2 flipped bits, both in band 0 → bands 1,2 identical
      1L -> base,
      2L -> (base ^ 0x3L),
      // pair (11,12): bits in band 0 AND band 2 → only band 1 identical
      11L -> (base ^ (0x9L << 4)),
      12L -> (base ^ (0x9L << 4) ^ (1L << 3) ^ (1L << 23)),
      // pair (21,22): Hamming 3 across all three bands → no identical band
      21L -> (base ^ (0x5L << 5)),
      22L -> (base ^ (0x5L << 5) ^ (1L << 2) ^ (1L << 13) ^ (1L << 27)),
      // pair (31,32): Hamming 1 (always found, 2 identical bands)
      31L -> (base ^ (0x11L << 3)),
      32L -> (base ^ (0x11L << 3) ^ (1L << 29))
    ).toDF("doc_id", "sim")

    val got = bandPairs(sims).orderBy("a", "b").collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val want = brutePairs(sims).orderBy("a", "b").collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(got.sameElements(want), s"band=${got.toSeq} brute=${want.toSeq}")
    // The constructed truths, explicitly: cross-band pair (11,12) must be
    // found via its single surviving band; the Hamming-3 pair must not.
    val pairs = got.map(t => (t._1, t._2)).toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((11L, 12L)) && pairs.contains((31L, 32L)))
    assert(!pairs.contains((21L, 22L)))
  }
}
