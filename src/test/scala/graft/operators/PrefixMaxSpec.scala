package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** `Partitioning.prefixMax` must equal the single-partition
  * `Window.orderBy` form row for row — including the all-null prefix of the
  * global minimum and runs where the max never advances — while keeping
  * every data-sized window pid-partitioned.
  */
class PrefixMaxSpec extends SparkSpec {
  import spark.implicits._

  test("matches the single-partition window on adversarial data") {
    // Unique keys, values with long flat runs, negatives, and a late global
    // max — shapes where a wrong tie/boundary rule shows immediately.
    val rows = (1 to 500).map { k =>
      (k.toLong, ((k * 37) % 11 - 5).toLong)
    }
    val df = rows.toDF("k", "v")
    val got = Partitioning.prefixMax(df, "k", "v", numPartitions = 7)
      .select(col("k"), col("prev_max")).as[(Long, Option[Long])]
      .collect().toMap
    val w = Window.orderBy(col("k")).rowsBetween(Window.unboundedPreceding, -1)
    val want = df.withColumn("prev_max", max(col("v")).over(w))
      .select(col("k"), col("prev_max")).as[(Long, Option[Long])]
      .collect().toMap
    assert(got == want)
    assert(got(1L).isEmpty, "the global minimum key has no preceding rows")
  }

  test("no data-sized single-partition window in the plan") {
    val df = (1 to 100).map(i => (i.toLong, i.toLong)).toDF("k", "v")
    val out = Partitioning.prefixMax(df, "k", "v", numPartitions = 4)
    val plan = out.queryExecution.optimizedPlan.toString
    // Two windows: the pid-partitioned local pass and the numPartitions-row
    // prefix pass. Only the latter may be unpartitioned.
    val windows = "windowspecdefinition\\(([^,]*)".r
      .findAllMatchIn(plan.toLowerCase).map(_.group(1)).toList
    assert(windows.nonEmpty, s"expected window specs in:\n$plan")
    assert(windows.exists(_.contains("__pid")),
      s"the data-sized pass must partition by __pid:\n$plan")
  }
}
