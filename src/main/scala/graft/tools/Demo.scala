package graft.tools

import graft.{Graft, Tables}
import graft.functions.Scalars
import org.apache.spark.sql.functions._

/** Runnable demo/verification driver: applies the scalar layer to the real
  * testdata `events` table and prints the result — the library's package
  * boundary exercised end-to-end through a real Spark plan.
  *
  * Usage: sbt "runMain graft.tools.Demo [sfDir]"
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = Graft.session("graft-demo")
    import spark.implicits._

    val events = Tables(spark, sfDir).events
    val out = events
      .withColumn("epoch_us", unix_micros($"ts"))
      .select(
        $"event_id",
        Scalars.priorityLabel(($"user_id" % 4) + 1).as("priority_str"),
        Scalars.isoMicrosTrimmed($"epoch_us").as("iso_ts"),
        Scalars.timeBucket(($"epoch_us" / 1000000L).cast("long"), 3600L).as("hour_bucket"),
        Scalars.sha256Hex($"event_type").as("type_hash"),
        Scalars
          .eventTimeWithFallback(
            when($"event_id" % 2 === 0, date_format($"ts", Scalars.SnortTimestampFormat))
              .otherwise(lit("garbage")),
            ($"epoch_us" / 1000000L).cast("long"))
          .as("event_time"))
      .orderBy($"event_id")
    out.show(10, truncate = false)
    println(s"rows=${out.count()}")
    spark.stop()
  }
}
