package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Offline state-store audit — Spark 4's `statestore` / `state-metadata`
  * batch readers over a streaming checkpoint. This is the ops capability a
  * 100 TB streaming deployment of the reference pipeline needs and the
  * reference's log-based stats loop cannot give (`internal/app/app.go:75`):
  * when a stateful query misbehaves in production, the state is inspected
  * OFFLINE as a DataFrame — no code in the streaming job, no state dump
  * instrumentation, no replay — and the inspection scales like any other
  * parquet-ish scan (one task per state partition).
  *
  * Pins: (1) the state rows of a running-count aggregation read back
  * offline equal the aggregate the stream emitted — key-by-key; (2) the
  * state-metadata reader enumerates the operator with its partition count,
  * which is how an operator-id-blind audit script finds what to read.
  */
class StateReaderSpec extends SparkSpec {
  import spark.implicits._

  test("statestore reader returns the aggregation state key-by-key") {
    val ckpt = Files.createTempDirectory("graft-state-read").toString
    val in = MemoryStream[(String, Long)](spark)
    val counts = in.toDF().toDF("k", "v")
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
    val q = counts.writeStream
      .outputMode(OutputMode.Update)
      .option("checkpointLocation", ckpt)
      .format("memory").queryName("state_read_out").start()
    in.addData(("a", 1L), ("a", 2L), ("b", 10L))
    q.processAllAvailable()
    in.addData(("a", 4L), ("c", 100L))
    q.processAllAvailable()
    q.stop()

    // state value fields carry the PHYSICAL aggregate buffer names
    // (count/sum), not the query's output aliases — the audit reads the
    // operator's internal layout, which is exactly the point
    val state = spark.read.format("statestore").load(ckpt)
      .select(col("key.k").as("k"), col("value.count").as("n"), col("value.sum").as("sv"))
      .as[(String, Long, Long)].collect()
      .map { case (k, n, s) => k -> ((n, s)) }.toMap
    assert(state == Map("a" -> ((3L, 7L)), "b" -> ((1L, 10L)), "c" -> ((1L, 100L))),
      s"offline state read disagrees with the stream's aggregate: $state")

    val meta = spark.read.format("state-metadata").load(ckpt)
    val ops = meta.select(col("operatorName")).as[String].collect().toSet
    assert(ops.contains("stateStoreSave"),
      s"state-metadata should enumerate the aggregation operator, got $ops")
    val parts = meta.filter(col("operatorName") === "stateStoreSave")
      .select(col("numPartitions")).as[Int].head()
    assert(parts == spark.conf.get("spark.sql.shuffle.partitions").toInt)
  }
}
