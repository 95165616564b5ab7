package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{
  MapState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Arbitrary-state streaming on Spark 4's `transformWithState` — the
  * successor API to `mapGroupsWithState` (which the engine already covers
  * in [[StreamOps]] for the reference's per-sensor summary path, SURVEY.md
  * §2C streaming row). What the new API adds, and what this operator
  * exercises deliberately:
  *
  *   - MULTIPLE named state variables per key with independent lifecycles
  *     (a ValueState for the running totals, a MapState for per-type
  *     counts) instead of one monolithic state object rewritten per
  *     trigger — on RocksDB, the MapState's per-entry layout means a
  *     trigger touching one event type rewrites ONE store entry, not the
  *     whole user blob. At 100 TB/day with millions of live users that is
  *     the difference between O(touched entries) and O(state size) write
  *     amplification per trigger.
  *   - First-class per-variable TTL (TTLConfig) and timers; totals here
  *     use TTLConfig.NONE explicitly — the eviction contract for bounded
  *     state lives in the watermark/session specs (StateSoakSpec).
  *
  * Semantics: per user, a running (event count, exact-cents value total,
  * distinct event-type count) emitted in Update mode once per trigger the
  * user appears in. Deterministic regardless of row order within a
  * trigger (the fold is commutative), so parity with the batch groupBy
  * aggregate is exact — TransformWithStateSpec pins it, plus
  * trigger-split invariance and the store-entry shape.
  *
  * Requires the RocksDB state store provider (the API's only supported
  * backend), set by callers/specs via
  * `spark.sql.streaming.stateStore.providerClass`.
  */
object StatefulOps {

  final case class UserTotals(userId: Long, nEvents: Long, cents: Long, nTypes: Long)

  /** Per-user running profile processor. Keyed state:
    * `totals: ValueState[(n, cents)]`, `perType: MapState[type, n]`.
    */
  final class UserTotalsProcessor
      extends StatefulProcessor[Long, StreamOps.UserEvent, UserTotals] {
    @transient private var totals: ValueState[(Long, Long)] = _
    @transient private var perType: MapState[String, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      totals = getHandle.getValueState[(Long, Long)](
        "totals", Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong), TTLConfig.NONE)
      perType = getHandle.getMapState[String, Long](
        "perType", Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(
        userId: Long,
        rows: Iterator[StreamOps.UserEvent],
        timerValues: TimerValues): Iterator[UserTotals] = {
      var (n, c) = if (totals.exists()) totals.get() else (0L, 0L)
      rows.foreach { r =>
        n += 1
        c += r.cents
        val cur = if (perType.containsKey(r.eventType)) perType.getValue(r.eventType) else 0L
        perType.updateValue(r.eventType, cur + 1L)
      }
      totals.update((n, c))
      Iterator.single(UserTotals(userId, n, c, perType.keys().size.toLong))
    }
  }

  /** Wire the processor over a stream of user events; Update-mode rows of
    * the latest per-user running profile.
    */
  def runningUserTotals(events: Dataset[StreamOps.UserEvent]): Dataset[UserTotals] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.userId)
      .transformWithState(new UserTotalsProcessor, TimeMode.None(), OutputMode.Update())
  }
}
