package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** `Profiling.observeKeepRate`: the observed tallies must EQUAL the
  * separately-aggregated truth (same predicate, second scan), while the
  * observed plan itself runs ONE scan — the whole point of the
  * CollectMetrics node. Streaming twin: per-batch tallies must surface
  * in StreamingQueryProgress.observedMetrics.
  */
class ProfilingObserveSpec extends SparkSpec {
  import spark.implicits._

  test("batch: observed tallies equal a second-pass aggregation, on one scan") {
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    val keep = length(col("text")) >= 200
    val (observed, obs) = Profiling.observeKeepRate(docs, keep, "quality")
    val outRows = observed.filter(keep).count() // the "pipeline" consumes the frame
    val m = obs.get
    val truth = docs.agg(
      count(lit(1)).as("n"),
      sum(when(keep, 1L).otherwise(0L)).as("k")).head()
    assert(m("n_rows") == truth.getLong(0))
    assert(m("n_keep") == truth.getLong(1))
    assert(m("n_drop") == truth.getLong(0) - truth.getLong(1))
    assert(outRows == truth.getLong(1))
    // the observed frame's physical plan carries the metrics collector
    // inline — profiling added no second scan to the consuming job
    val plan = observed.filter(keep).queryExecution.executedPlan.toString
    assert(plan.contains("CollectMetrics"), plan.take(1500))
    assert("FileScan|BatchScan".r.findAllIn(plan).size == 1, plan.take(1500))
  }

  test("streaming: per-batch tallies surface in observedMetrics") {
    val in = MemoryStream[(Long, String)](spark)
    val df = Profiling.observeKeepRateStream(
      in.toDF().toDF("id", "text"), length(col("text")) >= 5, "quality")
    val q = df.writeStream.outputMode(OutputMode.Append).format("memory")
      .queryName("obs_stream").start()
    try {
      in.addData((1L, "long enough"), (2L, "ok!"), (3L, "also long enough"))
      q.processAllAvailable()
      val m = q.lastProgress.observedMetrics.get("quality")
      assert(m != null, "observedMetrics must carry the named observe")
      assert(m.getAs[Long]("n_rows") == 3L)
      assert(m.getAs[Long]("n_keep") == 2L)
      assert(m.getAs[Long]("n_drop") == 1L)
    } finally q.stop()
  }
}
