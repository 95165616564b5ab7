package graft.operators

import graft.{SparkSpec, Tables}
import graft.queries.AllQueries
import org.apache.spark.sql.functions._

/** The quadratic-per-group fence (r10 verdict task 6): Guards.boundedGroups
  * must pass data inside its cap through untouched, throw a named error
  * with the remediation hint on a pathological key, and the two catalog
  * queries that own a per-group pair expansion must run their guard.
  */
class GuardsSpec extends SparkSpec {

  /** Write a synthetic `events` table to a temp sf-dir so the catalog
    * query under test runs against the pathological shape through its
    * normal table path.
    */
  private def tablesWithEvents(events: org.apache.spark.sql.DataFrame): Tables = {
    val dir = java.nio.file.Files.createTempDirectory("graft-guards").toString
    events.write.mode("overwrite").parquet(s"$dir/events.parquet")
    Tables(spark, dir)
  }

  test("passes through under the cap, empty input included") {
    val df = spark.range(100)
      .select((col("id") % 10).as("k"), col("id").as("v"))
    assert(Guards.boundedGroups(df, cap = 10, hint = "", col("k")).count() === 100)
    val empty = df.filter(col("v") < 0)
    assert(Guards.boundedGroups(empty, cap = 1, hint = "", col("k")).count() === 0)
  }

  test("throws a named error with the hint on a pathological group") {
    val skewed = spark.range(1000)
      .select(when(col("id") < 900, lit(7L)).otherwise(col("id")).as("k"))
    val e = intercept[IllegalStateException] {
      Guards.boundedGroups(skewed, cap = 100, hint = "downsample first", col("k"))
    }
    assert(e.getMessage.contains("900 rows"))
    assert(e.getMessage.contains("downsample first"))
  }

  test("theil-sen trips its guard when one user's series outgrows the cap") {
    // a synthetic `events` twin whose one user has > 4096 distinct days —
    // built through the same catalog query by substituting the table
    val spark0 = spark
    import spark0.implicits._
    val pathological = (0 to 4200).map { d =>
      (d.toLong, 1L, java.sql.Timestamp.valueOf(
        java.time.LocalDateTime.of(2000, 1, 1, 0, 0).plusDays(d)), "view", 1.0)
    }.toDF("event_id", "user_id", "ts", "event_type", "value")
    val t = Tables(spark, sf())
    val swapped = tablesWithEvents(pathological)
    val e = intercept[IllegalStateException] {
      AllQueries.all("q_ts_theil_sen").run(swapped).collect()
    }
    assert(e.getMessage.contains("Guards.boundedGroups"))
    assert(e.getMessage.toLowerCase.contains("downsample"))
    // and the real testdata passes the same guard (the catalog gate relies
    // on it, but pin it here so a cap typo fails fast in-suite)
    assert(AllQueries.all("q_ts_theil_sen").run(t).limit(1).count() === 1)
  }

  test("basket affinity trips its guard on a high-cardinality item domain") {
    val spark0 = spark
    import spark0.implicits._
    // one user-day basket containing 1500 distinct "types" (a SKU-like
    // domain) — exactly the re-pointing mistake the guard exists to catch
    val pathological = (0 until 1500).map { i =>
      (i.toLong, 1L, java.sql.Timestamp.valueOf("2024-01-01 12:00:00"),
        s"sku_$i", 1.0)
    }.toDF("event_id", "user_id", "ts", "event_type", "value")
    val swapped = tablesWithEvents(pathological)
    val e = intercept[IllegalStateException] {
      AllQueries.all("q_events_basket_affinity").run(swapped).collect()
    }
    assert(e.getMessage.contains("Guards.boundedGroups"))
    assert(e.getMessage.toLowerCase.contains("support floor"))
  }
}
