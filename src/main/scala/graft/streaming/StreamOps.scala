package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming operator surface (SURVEY.md §2C streaming row):
  * watermarked tumbling/sliding/session windows, streaming dedup, stateful
  * per-key aggregation (the reference's latent AlertSummary,
  * protos/sensor_event.proto:75-77 + B1 time bucketing), and stream-static
  * enrichment (B3 ip-lookup shape: dedup the key set, broadcast-join back).
  *
  * State discipline at 100 TB (SURVEY.md §7.4 hard-part 5): every stateful
  * op here REQUIRES a watermark so the state store is bounded; keys are the
  * shuffle partitioning, so state scales horizontally with executors.
  */
object StreamOps {

  /** Tumbling-window counts with late-data drop. */
  def tumblingCounts(
      events: DataFrame,
      tsCol: String,
      width: String,
      watermark: String,
      keyCols: String*): DataFrame = {
    val keyed = keyCols.map(col)
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), width) +: keyed: _*)
      .agg(count(lit(1)).as("n"))
      .select(
        (Seq(col("window.start").as("window_start"), col("window.end").as("window_end")) ++
          keyed :+ col("n")): _*)
  }

  /** Sliding-window counts (width, slide). */
  def slidingCounts(
      events: DataFrame,
      tsCol: String,
      width: String,
      slide: String,
      watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), width, slide))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("window.end").as("window_end"), col("n"))

  /** Session windows: rows gapped less than `gap` merge into one session. */
  def sessionCounts(
      events: DataFrame,
      tsCol: String,
      gap: String,
      watermark: String,
      keyCols: String*): DataFrame = {
    val keyed = keyCols.map(col)
    events
      .withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap) +: keyed: _*)
      .agg(count(lit(1)).as("n"))
      .select(
        (Seq(col("session_window.start").as("session_start"),
          col("session_window.end").as("session_end")) ++ keyed :+ col("n")): _*)
  }

  /** Streaming dedup on a key (the at-least-once → exactly-once repair the
    * reference enables via its sha256 record key, SURVEY.md A10): state is
    * dropped once the watermark passes.
    */
  def streamingDedup(events: DataFrame, tsCol: String, watermark: String, keys: String*): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keys.toSeq)

  /** Running per-sensor alert totals — the reference's AlertSummary intent
    * as an explicit `mapGroupsWithState` accumulator (update-mode output:
    * one (sensor_id, total) row per group per trigger).
    */
  final case class AlertCount(sensorId: String, total: Long)

  def alertSummary(alerts: Dataset[(String, Long)]): Dataset[AlertCount] = {
    import alerts.sparkSession.implicits._
    alerts
      .groupByKey(_._1)
      .mapGroupsWithState[Long, AlertCount](GroupStateTimeout.NoTimeout) {
        (sensorId: String, rows: Iterator[(String, Long)], state: GroupState[Long]) =>
          val total = state.getOption.getOrElse(0L) + rows.map(_._2).sum
          state.update(total)
          AlertCount(sensorId, total)
      }
  }

  /** The reference's full latent AlertSummary intent (AlertSummary proto +
    * B1 time bucketing): running totals keyed by (sensor, time bucket).
    * Input rows: (sensorId, epochSeconds, count).
    */
  final case class AlertSummaryRow(sensorId: String, bucketStart: Long, totalAlerts: Long)

  def alertSummaryBucketed(
      alerts: Dataset[(String, Long, Long)],
      bucketSeconds: Long): Dataset[AlertSummaryRow] = {
    import alerts.sparkSession.implicits._
    alerts
      .groupByKey { case (sensor, epochS, _) =>
        (sensor, epochS - Math.floorMod(epochS, bucketSeconds))
      }
      .mapGroupsWithState[Long, AlertSummaryRow](GroupStateTimeout.NoTimeout) {
        case ((sensor, bucket), rows, state) =>
          val total = state.getOption.getOrElse(0L) + rows.map(_._3).sum
          state.update(total)
          AlertSummaryRow(sensor, bucket, total)
      }
  }

  /** Stream-static enrichment, B3 shape: the stream side keeps its
    * cardinality; the static dim is broadcast so no stream shuffle happens.
    * (The reference dedups the key set before fan-out to an HTTP service —
    * with a broadcast dim table the dedup is unnecessary; Catalyst routes
    * each row through the broadcast hash table.)
    */
  def enrichWithStatic(stream: DataFrame, dim: DataFrame, key: String): DataFrame =
    stream.join(broadcast(dim), Seq(key), "left")

  /** Output-mode helper used by specs: run a streaming Dataset to a named
    * in-memory table and block until all available input is processed.
    */
  def runToMemory(df: DataFrame, name: String, mode: OutputMode): Unit = {
    val q = df.writeStream.outputMode(mode).format("memory").queryName(name).start()
    q.processAllAvailable()
    q.stop()
  }
}
