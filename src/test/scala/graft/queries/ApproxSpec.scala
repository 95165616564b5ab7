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
}
