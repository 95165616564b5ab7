package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Edge semantics the sf-testdata oracle points don't force: the mixture
  * sampler's rate-clamp rule and the gap-fill LOCF carry behavior.
  */
class MixtureGapfillSpec extends SparkSpec {
  import spark.implicits._

  test("mixture resampling clamps rates at 1.0 — budget beyond a stratum keeps every row") {
    // two strata of 4 rows; weight 9:1 with a 0.5 budget → 'a' wants
    // 0.5·8·(9/10)/4 = 0.9 of its rows, 'b' wants 0.5·8·(1/10)/4 = 0.1;
    // with weight 99:1 'a' wants 3.96/4 → still < 1; push to clamp with
    // budgetFrac 1.0: rate_a = 8·0.99/4 = 1.98 → clamped, ALL of 'a' kept
    val df = (0L until 8L).map(i => (i, if (i < 4) "a" else "b")).toDF("id", "src")
    val kept = Sampling.mixtureResample(df, "src", "id",
      weightOf = expr("CASE WHEN src = 'a' THEN 99 ELSE 1 END"),
      budgetFrac = 1.0, salt = "mixspec")
      .select(col("id")).as[Long].collect().toSet
    assert(Set(0L, 1L, 2L, 3L).subsetOf(kept),
      s"clamped stratum must keep every row, kept only $kept")
  }

  test("mixture resampling draws are a subset of the stratum and deterministic") {
    val df = (0L until 1000L).map(i => (i, s"s${i % 4}")).toDF("id", "src")
    def run() = Sampling.mixtureResample(df, "src", "id",
      weightOf = lit(1), budgetFrac = 0.3, salt = "mixspec2")
      .select(col("id")).as[Long].collect().toSet
    val a = run()
    assert(a == run(), "draws must be deterministic")
    assert(a.nonEmpty && a.size < 1000, s"0.3 budget must thin the corpus, kept ${a.size}")
  }

  test("gap fill carries the last observation across multi-day gaps") {
    // one user, observations on days 0 and 3 (of the epoch-day grid):
    // days 1 and 2 must exist with v null and v_filled carried from day 0
    val usDay = 86400000000L
    val rows = Seq(
      (1L, java.sql.Timestamp.from(java.time.Instant.EPOCH), 10.0),
      (1L, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(3 * 86400)), 99.0))
    val dir = java.nio.file.Files.createTempDirectory("graft-gap").toString
    try {
      rows.toDF("user_id", "ts", "value")
        .withColumn("ts", expr("unix_micros(ts) * 1000")) // store as ns like events
        .withColumn("event_id", col("user_id"))
        .withColumn("event_type", lit("x"))
        .withColumn("props", lit("{}"))
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val got = graft.queries.AllQueries.all("q_ts_gapfill")
        .run(graft.Tables(spark, dir))
        .select(col("day"), col("v"), col("v_filled"))
        .as[(Long, Option[Double], Option[Double])].collect().sortBy(_._1)
      assert(got.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L), s"grid must span the gap: ${got.toSeq}")
      assert(got(1)._2.isEmpty && got(2)._2.isEmpty, "gap days observe nothing")
      assert(got(1)._3.contains(10.0) && got(2)._3.contains(10.0),
        s"LOCF must carry day-0's value across the gap: ${got.toSeq}")
      assert(got(3)._3.contains(99.0))
    } finally {
      scala.reflect.io.Path(new java.io.File(dir)).deleteRecursively()
      ()
    }
  }
}
