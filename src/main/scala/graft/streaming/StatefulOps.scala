package graft.streaming

import graft.operators.KmvSketch
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

  /** An event on the timed-session stream (real timestamp column so the
    * watermark — and therefore the event-time timers — have something to
    * advance on). */
  final case class TimedEvent(
    ts: java.sql.Timestamp, userId: Long, eventId: Long, cents: Long)

  final case class SessionSummary(
    userId: Long, startMs: Long, endMs: Long, nEvents: Long, cents: Long)

  /** Session closing by EVENT-TIME TIMER — what transformWithState adds
    * over both `session_window` (fixed aggregate shape only) and
    * `mapGroupsWithState` (whose processing-time timeouts make tests and
    * replays nondeterministic): the processor keeps one open session per
    * user and arms a timer at lastEvent + gap; when the WATERMARK passes
    * that instant the engine calls handleExpiredTimer, the summary is
    * emitted, and the state is cleared. Close time is a pure function of
    * event time, so replaying the same input gives the same output —
    * wall-clock never enters the semantics. One fixed-size state record
    * and at most one live timer per open session; both evicted on close,
    * so state is O(live sessions) exactly like the watermarked
    * session_window (StateSoakSpec's plateau argument applies unchanged).
    */
  final class SessionProcessor(gapMs: Long)
      extends StatefulProcessor[Long, TimedEvent, SessionSummary] {
    @transient private var sess: ValueState[(Long, Long, Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      sess = getHandle.getValueState[(Long, Long, Long, Long)](
        "session",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
          Encoders.scalaLong, Encoders.scalaLong),
        TTLConfig.NONE)
    }

    override def handleInputRows(
        userId: Long,
        rows: Iterator[TimedEvent],
        timerValues: TimerValues): Iterator[SessionSummary] = {
      val out = Vector.newBuilder[SessionSummary]
      var cur = if (sess.exists()) Some(sess.get()) else None
      // Earlier-session accumulator for late-but-within-watermark events
      // that fall more than gap BEFORE the stored session start: standard
      // session semantics make them separate earlier sessions, never a
      // backwards extension whose internal gap would exceed gapMs. The
      // batch is sorted, so consecutive such stragglers within gap of each
      // other fold into ONE pending fragment here instead of emitting one
      // singleton each; the pending fragment closes when a straggler
      // arrives beyond its gap, or when the SESSION closes — inline or at
      // end of batch — where the LIVE fragment gets its merge chance: if
      // in-batch events have meanwhile backward-extended the session
      // start via min(s,t) to within gapMs of the fragment's end, the
      // fragment IS the same session and is folded into it rather than
      // emitted (r11 ADVICE, both close sites; only the last fragment can
      // qualify — any earlier one closed precisely because the next
      // straggler already sat beyond its gap, and that straggler bounds
      // the extended start from below). Residual (documented):
      // stragglers in DIFFERENT batches that are within gap of each other
      // still emit as separate fragments — exact cross-batch fragment
      // merging needs a multi-interval state list, which this processor
      // trades away for fixed-size state.
      var pending: Option[(Long, Long, Long, Long)] = None
      def closePending(): Unit = pending.foreach { case (ps, pl, pn, pc) =>
        out += SessionSummary(userId, ps, pl, pn, pc)
        pending = None
      }
      // Close a session whose (possibly backward-extended) start may have
      // come within gap of the live fragment's end: fold the fragment in
      // when it has, emit both separately when it hasn't. Used at BOTH
      // close sites — inline (data gap inside the batch) and end-of-batch
      // — because a fragment that misses its merge at an inline close can
      // never merge later (every subsequent event, and so every later
      // session start, sits at or after the closing event's time, which
      // is already > gap past the fragment).
      def mergedWithPending(s: Long, last: Long, n: Long, c: Long)
          : (Long, Long, Long, Long) =
        pending match {
          case Some((ps, pl, pn, pc)) if s - pl <= gapMs =>
            pending = None
            (math.min(ps, s), math.max(last, pl), n + pn, c + pc)
          case _ =>
            closePending()
            (s, last, n, c)
        }
      rows.toVector.sortBy(r => (r.ts.getTime, r.eventId)).foreach { r =>
        val t = r.ts.getTime
        cur match {
          case Some((s, _, _, _)) if t < s - gapMs =>
            pending match {
              case Some((ps, pl, pn, pc)) if t - pl <= gapMs =>
                // sorted batch ⇒ t ≥ pl, so max() is just belt-and-braces
                pending = Some((ps, math.max(pl, t), pn + 1L, pc + r.cents))
              case _ =>
                closePending()
                pending = Some((t, t, 1L, r.cents))
            }
          case Some((s, last, n, c)) if t - last <= gapMs =>
            // min on the start too: a late-but-within-watermark event that
            // predates the stored session start by AT MOST the gap must
            // EXTEND the session backwards, not silently report a too-late
            // startMs (in-batch out-of-order is handled by the sortBy;
            // this is the cross-batch path)
            cur = Some((math.min(s, t), math.max(last, t), n + 1L, c + r.cents))
          case Some((s, last, n, c)) =>
            // gap already exceeded WITHIN the data — close inline (with
            // the fragment merge chance: earlier in-batch events may have
            // backward-extended s to within gap of the fragment), open anew
            val (ms, ml, mn, mc) = mergedWithPending(s, last, n, c)
            out += SessionSummary(userId, ms, ml, mn, mc)
            cur = Some((t, t, 1L, r.cents))
          case None =>
            cur = Some((t, t, 1L, r.cents))
        }
      }
      // end-of-batch: merge the live fragment into the (possibly
      // backward-extended) session when the gap between them has closed;
      // otherwise emit it as the separate earlier session it is
      cur match {
        case Some((s, last, n, c)) => cur = Some(mergedWithPending(s, last, n, c))
        case None => closePending()
      }
      cur.foreach { st =>
        sess.update(st)
        // re-arm: exactly one live timer per open session
        getHandle.listTimers().foreach(t => getHandle.deleteTimer(t.asInstanceOf[Long]))
        getHandle.registerTimer(st._2 + gapMs)
      }
      out.result().iterator
    }

    override def handleExpiredTimer(
        userId: Long,
        timerValues: TimerValues,
        expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[SessionSummary] = {
      if (sess.exists()) {
        val (s, last, n, c) = sess.get()
        sess.clear()
        Iterator.single(SessionSummary(userId, s, last, n, c))
      } else Iterator.empty
    }
  }

  /** Timer-closed sessionization over a watermarked event stream. */
  def timedSessions(events: Dataset[TimedEvent], gapMs: Long,
      watermark: String = "10 seconds"): Dataset[SessionSummary] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.userId)
      .transformWithState(new SessionProcessor(gapMs), TimeMode.EventTime(), OutputMode.Append())
  }

  final case class PatternCount(userId: Long, nEvents: Long, nMatches: Long)

  /** Streaming CEP — the incremental twin of q_events_pattern_match: the
    * regex scan "view, any clicks, purchase" (vc*p, non-overlapping,
    * left-to-right) compiled to a 2-state DFA folded over each user's
    * event stream. The batch query rebuilds the whole symbol string per
    * run; this processor holds THREE longs per user (prefix flag, event
    * count, match count) — state is O(live users), independent of history
    * length, which is what makes CEP viable on an unbounded stream (the
    * same reason Flink CEP compiles patterns to NFA state rather than
    * buffering events). DFA transitions mirror the regex scanner exactly:
    * 'v' (re)opens the prefix — including from inside an open prefix,
    * matching the scanner's restart-at-this-v behavior on "vvp" —
    * 'c' sustains it, 'p' completes a match and closes it, anything else
    * abandons it.
    *
    * Ordering contract: rows are sorted (ts, eventId) WITHIN a trigger;
    * parity with the batch regex count holds when triggers split the
    * per-user stream in event-time order (PatternMatchStreamSpec pins
    * single-trigger parity and ordered-split invariance). A cross-batch
    * late event is folded at arrival position — exact out-of-order CEP
    * needs watermark-bounded buffering (the timedSessions timer pattern),
    * traded away here for the fixed-size state.
    */
  final class PatternProcessor
      extends StatefulProcessor[Long, StreamOps.UserEvent, PatternCount] {
    @transient private var st: ValueState[(Long, Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      st = getHandle.getValueState[(Long, Long, Long)](
        "dfa",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong),
        TTLConfig.NONE)
    }

    override def handleInputRows(
        userId: Long,
        rows: Iterator[StreamOps.UserEvent],
        timerValues: TimerValues): Iterator[PatternCount] = {
      var (inPrefix, n, matches) = if (st.exists()) st.get() else (0L, 0L, 0L)
      rows.toVector.sortBy(r => (r.tsUs, r.eventId)).foreach { r =>
        n += 1
        r.eventType.headOption match {
          case Some('v') => inPrefix = 1L
          case Some('c') => // sustains an open prefix, never opens one
          case Some('p') =>
            if (inPrefix == 1L) { matches += 1; inPrefix = 0L }
          case _ => inPrefix = 0L
        }
      }
      st.update((inPrefix, n, matches))
      Iterator.single(PatternCount(userId, n, matches))
    }
  }

  /** Wire the CEP DFA over a stream of user events; Update-mode rows of
    * the latest per-user (events seen, pattern matches) counters.
    */
  def patternMatchCounts(events: Dataset[StreamOps.UserEvent]): Dataset[PatternCount] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.userId)
      .transformWithState(new PatternProcessor, TimeMode.None(), OutputMode.Update())
  }

  final case class CusumState(userId: Long, nEvents: Long, cusum: Long,
    firstAlarmEventId: Long) // -1 while no alarm

  /** Streaming CUSUM drift monitor — the incremental twin of q_ts_cusum:
    * the batch query needs the prefix-min identity because window frames
    * can't express the recursion, but the RECURSION ITSELF is exactly
    * one long of streaming state: S ← max(0, S + (cents − target)).
    * Deviations are against a FIXED target (the deployed-monitor reality:
    * the baseline is calibrated offline, the monitor compares against
    * it), the alarm fires when S crosses `threshold`, and the first
    * alarming event id is latched so a replay reports the same detection
    * point. Rows fold in (tsUs, eventId) order within a trigger; ordered
    * trigger splits are invariant (state carries), pinned by
    * CusumStreamSpec against a sequential replay.
    */
  final class CusumProcessor(target: Long, threshold: Long)
      extends StatefulProcessor[Long, StreamOps.UserEvent, CusumState] {
    @transient private var st: ValueState[(Long, Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      st = getHandle.getValueState[(Long, Long, Long)](
        "cusum",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong),
        TTLConfig.NONE)
    }

    override def handleInputRows(
        userId: Long,
        rows: Iterator[StreamOps.UserEvent],
        timerValues: TimerValues): Iterator[CusumState] = {
      var (n, s, alarm) = if (st.exists()) st.get() else (0L, 0L, -1L)
      rows.toVector.sortBy(r => (r.tsUs, r.eventId)).foreach { r =>
        n += 1
        s = math.max(0L, s + (r.cents - target))
        if (s > threshold && alarm < 0) alarm = r.eventId
      }
      st.update((n, s, alarm))
      Iterator.single(CusumState(userId, n, s, alarm))
    }
  }

  /** Wire the CUSUM monitor; Update-mode rows of the latest per-user
    * (events, statistic, first-alarm event id) state.
    */
  def cusumMonitor(events: Dataset[StreamOps.UserEvent], target: Long,
      threshold: Long): Dataset[CusumState] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.userId)
      .transformWithState(new CusumProcessor(target, threshold),
        TimeMode.None(), OutputMode.Update())
  }

  /** A pre-hashed observation on the sketch stream (callers hash with
    * `xxhash64(...)` in the plan so the processor stays value-agnostic).
    */
  final case class HashedValue(key: String, h: Long)

  /** The latest per-key sketch row: rows folded so far, the distinct
    * estimate, and the sketch array itself (exposed so parity against the
    * batch sketch can be asserted bit-for-bit, and so a downstream consumer
    * can keep merging — the sketch IS the mergeable summary).
    */
  final case class KmvSketchRow(key: String, nRows: Long, est: Long, sketch: Seq[Long])

  /** Streaming twin of the KMV distinct sketch (q_agg_kmv_set_ops /
    * [[graft.operators.KmvAggregator]]): per key, running bottom-k of the
    * distinct hashes seen so far.
    *
    * Why a sketch is THE streaming cardinality shape at 100 TB: exact
    * running COUNT(DISTINCT) state grows with the distinct count itself
    * (unbounded — the state store eventually holds every value ever seen),
    * while this state is ≤ k longs per key, FOREVER, with the estimate's
    * error fixed by k. And because the KMV merge is exact and
    * order/partition-independent (bottomK(a ∪ b) associative +
    * commutative, KmvSpec), the streaming state after ANY trigger split or
    * arrival order is BIT-IDENTICAL to the batch sketch of the same rows —
    * not approximately equal, equal — which KmvStreamSpec pins directly on
    * the emitted arrays. Exactly-once replay of a trigger is likewise
    * absorbed free: re-folding the same hashes cannot change a bottom-k.
    *
    * Update-mode: one refreshed row per key per trigger it appears in.
    */
  final class KmvDistinctProcessor(k: Int, ttl: TTLConfig = TTLConfig.NONE)
      extends StatefulProcessor[String, HashedValue, KmvSketchRow] {
    @transient private var sketch: ValueState[Seq[Long]] = _
    @transient private var seen: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      sketch = getHandle.getValueState[Seq[Long]]("sketch",
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]](),
        ttl)
      seen = getHandle.getValueState[Long]("seen", Encoders.scalaLong, ttl)
    }

    override def handleInputRows(
        key: String,
        rows: Iterator[HashedValue],
        timerValues: TimerValues): Iterator[KmvSketchRow] = {
      val cur = if (sketch.exists()) sketch.get() else Seq.empty[Long]
      var n = if (seen.exists()) seen.get() else 0L
      val batch = rows.map { r => n += 1; r.h }.toSeq
      val merged = KmvSketch.bottomK(k, cur ++ batch)
      sketch.update(merged)
      seen.update(n)
      Iterator.single(KmvSketchRow(key, n,
        KmvSketch.estimateDistinct(k, merged), merged))
    }
  }

  /** Wire the per-key KMV sketch; Update-mode rows of the latest sketch.
    * Per-key state is <= k longs forever, but the KEY COUNT is unbounded —
    * pass a processing-time `ttl` to evict idle keys when the key space is
    * open-ended (user ids, session ids); NONE only suits enum-like keys.
    */
  def kmvDistinct(values: Dataset[HashedValue], k: Int,
      ttl: TTLConfig = TTLConfig.NONE): Dataset[KmvSketchRow] = {
    import values.sparkSession.implicits._
    values
      .groupByKey(_.key)
      .transformWithState(new KmvDistinctProcessor(k, ttl),
        TimeMode.None(), OutputMode.Update())
  }

  /** The latest per-key CMS row: rows folded so far and the serialized
    * sketch (Spark's own `org.apache.spark.util.sketch.CountMinSketch`
    * wire format — deserializable, mergeable, probe-able downstream).
    */
  final case class CmsSketchRow(key: String, nRows: Long, sketch: Array[Byte])

  /** Streaming twin of the Count-Min frequency sketch
    * (q_agg_cms_heavy_hitters): per key, a running CMS of the hashes seen
    * so far — bounded state (depth×width counters, fixed by ε/confidence)
    * where exact running per-value counts would grow with the distinct
    * count.
    *
    * Parity contract (CmsStreamSpec): CMS counters ADD commutatively, so —
    * same seed — the streaming sketch bytes after any trigger split or
    * arrival order are BIT-IDENTICAL to the batch single-pass sketch.
    * The deliberate CONTRAST with [[KmvDistinctProcessor]]: a bottom-k is
    * idempotent (replays absorbed free), while CMS counters are NOT — an
    * at-least-once replay of a trigger double-counts its rows. Pipelines
    * needing replay-proof frequencies must dedup upstream of this
    * operator (the engine's streaming dedup-within-watermark) or accept
    * the CMS estimate's upward drift; the spec pins BOTH behaviors so the
    * contract is explicit rather than discovered in production.
    */
  final class CmsFreqProcessor(eps: Double, confidence: Double, seed: Int,
      ttl: TTLConfig = TTLConfig.NONE)
      extends StatefulProcessor[String, HashedValue, CmsSketchRow] {
    @transient private var sketch: ValueState[Array[Byte]] = _
    @transient private var seen: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      sketch = getHandle.getValueState[Array[Byte]]("cms", Encoders.BINARY, ttl)
      seen = getHandle.getValueState[Long]("seen", Encoders.scalaLong, ttl)
    }

    override def handleInputRows(
        key: String,
        rows: Iterator[HashedValue],
        timerValues: TimerValues): Iterator[CmsSketchRow] = {
      import org.apache.spark.util.sketch.CountMinSketch
      val cms =
        if (sketch.exists()) CountMinSketch.readFrom(sketch.get())
        else CountMinSketch.create(eps, confidence, seed)
      var n = if (seen.exists()) seen.get() else 0L
      rows.foreach { r => n += 1; cms.addLong(r.h) }
      val bytes = cms.toByteArray
      sketch.update(bytes)
      seen.update(n)
      Iterator.single(CmsSketchRow(key, n, bytes))
    }
  }

  /** Wire the per-key CMS; Update-mode rows of the latest sketch.
    * Same key-cardinality note as [[kmvDistinct]]: pass a `ttl` for
    * open-ended key spaces.
    */
  def cmsFrequency(values: Dataset[HashedValue], eps: Double = 0.001,
      confidence: Double = 0.99, seed: Int = 42,
      ttl: TTLConfig = TTLConfig.NONE): Dataset[CmsSketchRow] = {
    import values.sparkSession.implicits._
    values
      .groupByKey(_.key)
      .transformWithState(new CmsFreqProcessor(eps, confidence, seed, ttl),
        TimeMode.None(), OutputMode.Update())
  }

  /** A stamped observation for the replay-proof CMS composition: the
    * event id is the idempotency token, the event time bounds how long
    * the dedup operator must remember it.
    */
  final case class StampedValue(
    ts: java.sql.Timestamp, eventId: Long, key: String, h: Long)

  /** The shipped answer to the CMS at-least-once caveat (r11 verdict
    * task 5): [[cmsFrequency]]'s counters are not idempotent — a replayed
    * trigger double-counts (CmsStreamSpec pins it) — so this composition
    * puts Spark's own `dropDuplicatesWithinWatermark` on the
    * (key, event id) PAIR upstream of the fold. A redelivered event is
    * dropped by the dedup state before it can touch a counter, making the
    * composed pipeline's sketch bytes invariant under trigger replay (the
    * spec's replayed batch leaves totalCount unchanged — the exact
    * scenario the plain operator's caveat warns about).
    *
    * Idempotency-token contract (r12 ADVICE): `eventId` need only be
    * unique PER KEY, not globally — sources that stamp per-partition or
    * per-entity sequence numbers (the common Kafka layout) are safe,
    * because the dedup key is the (key, eventId) pair. Two LIVE events on
    * different keys sharing a sequence number both count; a redelivery is
    * only absorbed when it repeats both fields, which is what redelivery
    * means. What the contract still requires: one key must not reuse an
    * id for two DIFFERENT live events inside the watermark horizon — that
    * collision is indistinguishable from a redelivery and the second
    * event is dropped (counts drift down, the exact inversion this
    * operator exists to prevent — so use a real per-key sequence, not a
    * timestamp truncation).
    *
    * Cost model, stated next to the guarantee: the dedup operator holds
    * one state row PER EVENT ID inside the watermark horizon — O(events
    * in the delay window), where the CMS fold alone is O(keys). That is
    * the honest price of exactly-once-effect over an at-least-once
    * source, and it is bounded by the watermark (ids older than the
    * horizon are evicted; a replay arriving later than the horizon is
    * indistinguishable from a new event — the standard
    * dropDuplicatesWithinWatermark contract, so choose the delay to
    * cover the source's redelivery window, e.g. the Kafka transaction
    * timeout). Use the plain [[cmsFrequency]] when upstream is already
    * exactly-once or upward drift is acceptable; use this when it isn't.
    */
  def cmsFrequencyDeduped(values: Dataset[StampedValue],
      watermarkDelay: String = "10 seconds",
      eps: Double = 0.001, confidence: Double = 0.99, seed: Int = 42,
      ttl: TTLConfig = TTLConfig.NONE): Dataset[CmsSketchRow] = {
    import values.sparkSession.implicits._
    val deduped = values
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("key", "eventId")
      .map(v => HashedValue(v.key, v.h))
    cmsFrequency(deduped, eps, confidence, seed, ttl)
  }

  /** A raw observation on the quantile stream (values, not hashes — rank
    * queries need the actual magnitudes).
    */
  final case class Observation(key: String, v: Double)

  /** The latest per-key quantile row: rows folded so far and the running
    * p50/p95/p99 of everything seen.
    */
  final case class QuantileRow(key: String, nRows: Long,
      p50: Double, p95: Double, p99: Double)

  /** Streaming quantiles — the third member of the bounded-state sketch
    * family (KMV = cardinality, CMS = frequency, this = rank/percentile):
    * per key, a running Greenwald–Khanna summary (Spark's own
    * `QuantileSummaries`, the engine behind `approxQuantile`) answering
    * p50/p95/p99 over everything seen so far — the canonical streaming
    * latency-percentile monitor. State is O(1/ε · log(ε·n)) tuples
    * regardless of how many observations arrive; exact running
    * percentiles would require retaining every value forever.
    *
    * Contract honesty (QuantileStreamSpec pins all three family members'
    * DIFFERENT parity guarantees): KMV streaming state is bit-identical
    * to batch; CMS bytes are bit-identical but replays double-count; a GK
    * summary's internal structure depends on insertion/compression order,
    * so across trigger splits the summaries may DIFFER STRUCTURALLY while
    * every query keeps the rank guarantee — the spec therefore asserts
    * the ε·n rank envelope of each emitted percentile against the true
    * sorted ranks, per split shape, not byte equality.
    */
  final class QuantileProcessor(relativeError: Double,
      ttl: TTLConfig = TTLConfig.NONE)
      extends StatefulProcessor[String, Observation, QuantileRow] {
    @transient private var summary: ValueState[Array[Byte]] = _

    private def deserialize(b: Array[Byte]): org.apache.spark.sql.catalyst.util.QuantileSummaries = {
      val in = new java.io.ObjectInputStream(new java.io.ByteArrayInputStream(b))
      try in.readObject().asInstanceOf[org.apache.spark.sql.catalyst.util.QuantileSummaries]
      finally in.close()
    }

    private def serialize(s: org.apache.spark.sql.catalyst.util.QuantileSummaries): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val out = new java.io.ObjectOutputStream(bos)
      try { out.writeObject(s); out.flush(); bos.toByteArray }
      finally out.close()
    }

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      summary = getHandle.getValueState[Array[Byte]]("gk", Encoders.BINARY, ttl)
    }

    override def handleInputRows(
        key: String,
        rows: Iterator[Observation],
        timerValues: TimerValues): Iterator[QuantileRow] = {
      import org.apache.spark.sql.catalyst.util.QuantileSummaries
      var s =
        if (summary.exists()) deserialize(summary.get())
        else new QuantileSummaries(
          QuantileSummaries.defaultCompressThreshold, relativeError)
      rows.foreach(r => s = s.insert(r.v))
      s = s.compress()
      summary.update(serialize(s))
      def q(phi: Double): Double = s.query(phi).getOrElse(Double.NaN)
      Iterator.single(QuantileRow(key, s.count, q(0.5), q(0.95), q(0.99)))
    }
  }

  /** Wire the per-key running percentiles; Update-mode rows of the latest
    * p50/p95/p99.
    */
  def runningQuantiles(values: Dataset[Observation],
      relativeError: Double = 0.01,
      ttl: TTLConfig = TTLConfig.NONE): Dataset[QuantileRow] = {
    import values.sparkSession.implicits._
    values
      .groupByKey(_.key)
      .transformWithState(new QuantileProcessor(relativeError, ttl),
        TimeMode.None(), OutputMode.Update())
  }
}
