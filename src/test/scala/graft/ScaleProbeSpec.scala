package graft

import org.apache.spark.sql.functions._

/** The scale probe's replication must preserve the workload SHAPE: factor×
  * rows, factor× join fan-out, factor× LSH pairs. If replicas collided on
  * keys (join) or shingles (LSH), the probe would measure a quadratic
  * workload and its "ratio" would be meaningless.
  */
class ScaleProbeSpec extends SparkSpec {
  import spark.implicits._

  private val dir = sf("sf0.001")

  test("documents replication keeps LSH near-dup pairs linear in the factor") {
    val base = Graft.table(spark, dir, "documents")
    val pairs1 = graft.operators.Dedup
      .lshNearDupPairs(base, "doc_id", "text", threshold = 0.5).count()
    val docs3 = ScaleProbe.replicate(spark, dir, "documents", 3)
    assert(docs3.count() == 3 * base.count())
    val pairs3 = graft.operators.Dedup
      .lshNearDupPairs(docs3, "doc_id", "text", threshold = 0.5).count()
    // per-replica token injection makes clones dissimilar ACROSS replicas:
    // every pair stays within one replica, so the count is exactly linear
    assert(pairs3 == 3 * pairs1,
      s"expected ${3 * pairs1} pairs (linear), got $pairs3 — cross-replica collisions?")
    assert(pairs1 > 0)
  }

  test("join replication keeps fact-fact fan-out linear in the factor") {
    val cust = ScaleProbe.replicate(spark, dir, "customer", 3)
    val ord = ScaleProbe.replicate(spark, dir, "orders", 3)
    val li = ScaleProbe.replicate(spark, dir, "lineitem", 3)
    val joined = cust.join(ord, $"c_custkey" === $"o_custkey")
      .join(li, $"o_orderkey" === $"l_orderkey")
    val base = {
      val t = Tables(spark, dir)
      t.customer.join(t.orders, $"c_custkey" === $"o_custkey")
        .join(t.lineitem, $"o_orderkey" === $"l_orderkey")
    }
    assert(joined.count() == 3 * base.count())
  }
}
