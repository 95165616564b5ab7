package graft.queries

import graft.{Graft, SparkSpec}
import org.apache.spark.sql.functions._

/** Tolerance gate for the sketch-based operator (SURVEY.md §5.2 item 3):
  * approx_count_distinct's HLL is engine-specific (rows-only under the
  * DuckDB oracle), so correctness is a relative-error bound vs exact (rsd 0.01 sketch, 5% gate).
  */
class ApproxSpec extends SparkSpec {

  test("approx_count_distinct within 5% of exact on every group") {
    val li = Graft.table(spark, sf("sf0.01"), "lineitem")
    val rows = li.groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_orderkey")).as("exact"),
        approx_count_distinct(col("l_orderkey"), 0.01).as("approx"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact").toDouble
      val approx = r.getAs[Long]("approx").toDouble
      val relErr = math.abs(approx - exact) / exact
      assert(relErr <= 0.05, s"${r.getAs[String]("l_returnflag")}: exact=$exact approx=$approx err=$relErr")
    }
  }

  test("approx_percentile honors the GK rank-error bound at accuracy=100") {
    // Spark's approx_percentile (Greenwald–Khanna summaries) guarantees the
    // returned value's RANK is within ε·n of p·n for ε = 1/accuracy — a
    // deterministic bound, not a probabilistic one. Verify it the way the
    // guarantee is stated: count the returned value's actual rank envelope
    // and assert it straddles [(p−ε)·n, (p+ε)·n]. This is the single-pass
    // sketch a 100 TB percentile uses instead of a full sort.
    val li = Graft.table(spark, sf("sf0.01"), "lineitem")
      .select(col("l_extendedprice").as("x"))
    val n = li.count().toDouble
    val eps = 1.0 / 100
    for (p <- Seq(0.25, 0.5, 0.9)) {
      val v = li.agg(expr(s"approx_percentile(x, $p, 100)")).head().getDouble(0)
      val atMost = li.filter(col("x") <= v).count().toDouble
      val below = li.filter(col("x") < v).count().toDouble
      assert(atMost >= (p - eps) * n - 1,
        s"p=$p: value $v ranks too low (atMost=$atMost, n=$n)")
      assert(below <= (p + eps) * n + 1,
        s"p=$p: value $v ranks too high (below=$below, n=$n)")
    }
  }
}
