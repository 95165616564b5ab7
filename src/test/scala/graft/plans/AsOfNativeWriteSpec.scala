package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Verify-path shape: orderBy + coalesce(1) + parquet write over the
  * native as-of join (the driver's dump pipeline).
  */
class AsOfNativeWriteSpec extends SparkSpec {
  import spark.implicits._

  test("native as-of survives orderBy + coalesce + write (the Verify path)") {
    val events = graft.Graft.table(spark, sf(), "events")
    val purchases = events
      .filter($"event_type" === "purchase")
      .groupBy($"user_id", $"ts")
      .agg(max($"event_id").as("event_id"))
    val out = NativeAsOf.backward(
        events.select($"event_id", $"user_id", $"ts"), purchases,
        key = "user_id", leftTime = "ts", rightTime = "ts",
        valueCols = Seq("event_id"))
      .select($"event_id", $"asof_event_id".as("prev_purchase_id"))
      .orderBy($"event_id", $"prev_purchase_id")
    val dir = java.nio.file.Files.createTempDirectory("graft-asof-w").toString
    out.coalesce(1).write.mode("overwrite").parquet(dir)
    assert(spark.read.parquet(dir).count() == events.count())
  }
}
