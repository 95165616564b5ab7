package graft.queries

import graft.{Graft, SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Cross-check: the oracle-able window-function sessionization must agree
  * with Spark's native session_window on per-user session counts (same
  * 30-minute gap definition).
  */
class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  test("window-function sessionization == native session_window (session counts)") {
    val native = Graft.table(spark, sf("sf0.01"), "events")
      .groupBy(session_window($"ts", "30 minutes"), $"user_id")
      .agg(count(lit(1)).as("n"))
      .groupBy($"user_id").agg(count(lit(1)).as("n_sessions"))
      .as[(Long, Long)].collect().toMap
    val ours = AllQueries.all("q_win_sessionize")
      .run(Tables(spark, sf("sf0.01")))
      .groupBy($"user_id").agg(countDistinct($"session_id").as("n_sessions"))
      .as[(Long, Long)].collect().toMap
    assert(ours == native)
  }
}
