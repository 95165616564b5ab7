package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

/** Accuracy/associativity proof for q_agg_cms_heavy_hitters (rows-only at
  * the oracle gate, sketch internals being implementation-specific — the
  * q_agg_hll_merge treatment).
  */
class CmsSpec extends SparkSpec {

  private val eps = 0.001
  private val conf = 0.99

  private def events = spark.read.parquet(s"${sf("sf0.01")}/events.parquet")

  private def sketchOf(df: org.apache.spark.sql.DataFrame): CountMinSketch =
    df.agg(expr(s"count_min_sketch(user_id, ${eps}d, ${conf}d, 42)").as("sk"))
      .collect().map(r => CountMinSketch.readFrom(r.getAs[Array[Byte]](0))).head

  test("per-group merge equals the single-pass sketch on every probe") {
    val single = sketchOf(events)
    val merged = events.select(col("event_type")).distinct().collect()
      .map(r => sketchOf(events.filter(col("event_type") === r.getString(0))))
      .reduce((a, b) => a.mergeInPlace(b))
    assert(merged.totalCount() === single.totalCount())
    val keys = events.select(col("user_id")).distinct()
      .collect().map(_.getLong(0))
    keys.foreach { k =>
      assert(merged.estimateCount(java.lang.Long.valueOf(k)) ===
        single.estimateCount(java.lang.Long.valueOf(k)),
        s"merged vs single-pass estimate diverged for user $k")
    }
  }

  test("estimates never undercount and stay within the eps*N envelope") {
    val sk = sketchOf(events)
    val n = events.count()
    val exact = events.groupBy(col("user_id")).agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val bound = (eps * n).ceil.toLong
    var overBudget = 0
    exact.foreach { case (k, c) =>
      val e = sk.estimateCount(java.lang.Long.valueOf(k))
      assert(e >= c, s"CMS undercounted user $k: est $e < exact $c")
      if (e - c > bound) overBudget += 1
    }
    // ε·N holds per key with probability 1-δ = 0.99; allow the tail.
    assert(overBudget <= math.max(1, (exact.length * (1 - conf)).ceil.toInt),
      s"$overBudget of ${exact.length} keys exceeded the eps*N envelope")
  }

  test("fixed seed makes the sketch bytes deterministic across builds") {
    val a = sketchOf(events)
    val b = sketchOf(events)
    val keys = events.select(col("user_id")).distinct().collect().map(_.getLong(0))
    keys.foreach { k =>
      assert(a.estimateCount(java.lang.Long.valueOf(k)) ===
        b.estimateCount(java.lang.Long.valueOf(k)))
    }
  }
}
