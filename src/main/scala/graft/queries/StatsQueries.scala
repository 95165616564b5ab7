package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Decision-analytics shapes: Pareto skyline, marketing attribution, and an
  * A/B significance test. Each pairs a scale-safe Spark plan with an oracle
  * stated in a DIFFERENT formulation (quadratic NOT EXISTS, argmax join),
  * so the gate proves the rewrite, not just the arithmetic.
  */
object StatsQueries extends Catalog {

  def queries: Map[String, Q] = Map(

    // CEP-style sequence pattern matching (the MATCH_RECOGNIZE /
    // Flink-CEP shape Spark has no native operator for): each user's
    // event history becomes one compact symbol string (first letter of
    // the event type — the five types start with distinct letters), and
    // the pattern "view, then any clicks, then purchase" is the regex
    // vc*p counted non-overlapping left-to-right — identical scan
    // semantics in Java regex and DuckDB's RE2 for a pattern with no
    // alternation backtracking. Scale shape: ONE user-keyed exchange
    // builds the ordered symbol string (collect_list + array_sort —
    // bounded by per-user history, the same bound any per-user CEP
    // engine needs), and the regex count is a pure map over 1 row per
    // user. At 100 TB the per-user string is first windowed by session
    // (q_win_sessionize) so state stays bounded; the full-history form
    // here states the exact semantics.
    "q_events_pattern_match" -> Q(
      t => {
        val sym = t.events.select(col("user_id"),
          substring(col("event_type"), 1, 1).as("c"), col("ts"), col("event_id"))
        sym.groupBy(col("user_id"))
          .agg(array_join(transform(
            array_sort(collect_list(struct(col("ts"), col("event_id"), col("c")))),
            x => x.getField("c")), "").as("seq"))
          .select(col("user_id"),
            length(col("seq")).cast("long").as("n_events"),
            expr("cast(regexp_count(seq, 'vc*p') as bigint)").as("n_funnels"))
          .orderBy(col("user_id"))
      },
      Some("""WITH s AS (
              |  SELECT user_id,
              |         string_agg(substr(event_type, 1, 1), ''
              |           ORDER BY CAST(ts AS TIMESTAMP), event_id) AS seq
              |  FROM events GROUP BY user_id
              |)
              |SELECT user_id, CAST(length(seq) AS BIGINT) AS n_events,
              |       CAST(len(regexp_extract_all(seq, 'vc*p')) AS BIGINT) AS n_funnels
              |FROM s
              |ORDER BY user_id NULLS FIRST""".stripMargin)),

    // Sweep-line maximum concurrency — "how many sessions overlap at
    // peak" — the interval-stabbing aggregate that powers capacity
    // planning. Each event opens an interval [ts, ts + ceil(value) s];
    // the sweep unions +1/−1 boundary deltas and takes a running sum in
    // (time, delta) order, delta ascending so a closing interval never
    // counts as concurrent with one opening at the same instant. Peers at
    // identical (t, d) share the post-tie cumulative value on both
    // engines (RANGE-frame default). Scale shape: the sweep partitions by
    // event_type, so each group's ordered prefix sum runs in parallel; a
    // GLOBAL sweep needs the two-pass range-partitioned prefix sum (sort
    // by t, per-partition totals broadcast as offsets) — same plan the
    // engine uses for q_layout_binpack's exclusive prefix sum. Entirely
    // exact BIGINT; peak time reported as the EARLIEST instant achieving
    // the max (deterministic under ties by construction).
    "q_events_concurrency" -> Q(
      t => {
        val iv = t.events.select(col("event_type"),
          unix_micros(col("ts")).as("s"),
          (unix_micros(col("ts")) + ceil(col("value")).cast("long") * 1000000L).as("e"))
        val pts = iv.select(col("event_type"), col("s").as("t"), lit(1L).as("d"))
          .unionAll(iv.select(col("event_type"), col("e").as("t"), lit(-1L).as("d")))
        val sweep = Window.partitionBy(col("event_type")).orderBy(col("t"), col("d"))
        val run = pts.select(col("event_type"), col("t"),
          sum(col("d")).over(sweep).as("cur")).localCheckpoint(true)
        val mx = run.groupBy(col("event_type")).agg(max(col("cur")).as("max_concurrent"))
        run.join(mx, Seq("event_type"))
          .filter(col("cur") === col("max_concurrent"))
          .groupBy(col("event_type"), col("max_concurrent"))
          .agg(min(col("t")).as("first_peak_us"))
          .orderBy(col("event_type"))
      },
      Some("""WITH iv AS (
              |  SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS s,
              |         epoch_us(CAST(ts AS TIMESTAMP))
              |           + CAST(ceil(value) AS BIGINT) * 1000000 AS e
              |  FROM events
              |), pts AS (
              |  SELECT event_type, s AS t, CAST(1 AS BIGINT) AS d FROM iv
              |  UNION ALL
              |  SELECT event_type, e AS t, CAST(-1 AS BIGINT) AS d FROM iv
              |), run AS (
              |  SELECT event_type, t,
              |         CAST(SUM(d) OVER (PARTITION BY event_type
              |           ORDER BY t, d) AS BIGINT) AS cur
              |  FROM pts
              |), mx AS (
              |  SELECT event_type, MAX(cur) AS max_concurrent
              |  FROM run GROUP BY event_type
              |)
              |SELECT r.event_type, m.max_concurrent,
              |       MIN(r.t) AS first_peak_us
              |FROM run r JOIN mx m ON r.event_type = m.event_type
              |  AND r.cur = m.max_concurrent
              |GROUP BY r.event_type, m.max_concurrent
              |ORDER BY r.event_type NULLS FIRST""".stripMargin)),

    // Exact exponentially-weighted moving average (the time-series
    // smoother behind every monitoring dashboard), α = 1/2 truncated at
    // depth 20: weight for lag k is 2^(20−k), so numerator and
    // denominator are pure BIGINT and the result is bit-identical across
    // engines — no pow()/libm, no float accumulation order. Truncation
    // error vs the untruncated EWMA is < 2^-20 of the scale — below the
    // reported milli resolution. Scale shape: the window-with-
    // row-distance-dependent-weights that plain window frames can't
    // express becomes a bounded 21× FORWARD explode (each day pushes its
    // contribution to the next 20 row positions) + one (user, position)
    // hash aggregate — all equi-keyed, no range join, no
    // per-row history scan; cost is linear in user-days at any scale.
    // Precondition: event values are positive (profiled min 0.01), so
    // truncating div == floor div on both engines.
    "q_ts_ewma" -> Q(
      t => {
        val depth = 20
        val daily = t.events
          .groupBy(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"))
          .agg(sum(cents(col("value"))).cast("long").as("v"))
        // r18 optimization: the calendar day rides along on the k = 0
        // self-contribution (max over the group's single non-null day0),
        // so the join back to rn — and the rn localCheckpoint it forced —
        // disappear; groups with target beyond the user's last rn have no
        // k = 0 row and are dropped by the day filter, exactly the rows
        // the old inner join excluded. Same trick as q_ts_rolling_median.
        val rn = daily.select(col("user_id"), col("day"), col("v"),
          row_number().over(Window.partitionBy(col("user_id")).orderBy(col("day"))).as("rn"))
        val contrib = rn
          .select(col("user_id"), col("rn"), col("v"), col("day"),
            explode(sequence(lit(0), lit(depth))).as("k"))
          .select(col("user_id"), (col("rn") + col("k")).as("target"),
            expr(s"v * shiftleft(cast(1 as bigint), $depth - k)").as("wv"),
            expr(s"shiftleft(cast(1 as bigint), $depth - k)").as("w"),
            when(col("k") === 0, col("day")).as("day0"))
        contrib.groupBy(col("user_id"), col("target"))
          .agg(sum(col("wv")).as("num"), sum(col("w")).as("den"),
            max(col("day0")).as("day"))
          .filter(col("day").isNotNull)
          .select(col("user_id"), col("day"), expr("num * 1000 div den").as("ewma_milli"))
          .orderBy(col("user_id"), col("day"))
      },
      Some("""WITH daily AS (
              |  SELECT user_id,
              |         epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
              |         CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS v
              |  FROM events GROUP BY 1, 2
              |), r AS (
              |  SELECT user_id, day, v,
              |         row_number() OVER (PARTITION BY user_id ORDER BY day) AS rn
              |  FROM daily
              |), c AS (
              |  SELECT user_id, rn + k AS target,
              |         v * (CAST(1 AS BIGINT) << CAST(20 - k AS INTEGER)) AS wv,
              |         (CAST(1 AS BIGINT) << CAST(20 - k AS INTEGER)) AS w
              |  FROM r CROSS JOIN (SELECT unnest(range(0, 21)) AS k)
              |), a AS (
              |  SELECT user_id, target, CAST(SUM(wv) AS BIGINT) AS num,
              |         CAST(SUM(w) AS BIGINT) AS den
              |  FROM c GROUP BY 1, 2
              |)
              |SELECT r.user_id, r.day, (a.num * 1000 // a.den) AS ewma_milli
              |FROM r JOIN a ON r.user_id = a.user_id AND r.rn = a.target
              |ORDER BY r.user_id NULLS FIRST, r.day NULLS FIRST""".stripMargin)),

    // Rolling lower-median over the trailing 7 daily values — the robust
    // rolling smoother (a rolling MEAN is one window sum; a rolling
    // MEDIAN has no distributive form, which is why engines either
    // nlogn-sort per frame or approximate). Restated scale-safely: each
    // day pushes its value forward to the next 6 row positions (bounded
    // 7× explode), then ONE (user, position) groupBy collects the ≤7-row
    // frame and the lower median is the sorted frame's ⌈n/2⌉-th element;
    // the calendar day rides along on the k = 0 self-row. All BIGINT.
    // The oracle is the BANDED SELF-JOIN formulation (b.rn BETWEEN
    // a.rn−6 AND a.rn) — a different derivation of the same frames, so
    // the gate proves the forward-explode rewrite. Scale shape: every
    // exchange is (user, position)-keyed and the window partitions are
    // ≤7 rows by construction; cost is 7·user-days at any corpus size.
    "q_ts_rolling_median" -> Q(
      t => {
        // r18 optimization: the lower median of a ≤7-row frame does not
        // need the grouped-weight crossing machinery (groupBy(v) + two
        // window passes + min) nor the join-back that re-attached the
        // calendar day. Each (user, target) group holds the ≤7 forward-
        // pushed values, so ONE groupBy collects them, array_sort fixes
        // the nondeterministic collect order, and the lower median is
        // element ⌈n/2⌉ of the sorted array — the identical crossing
        // point cw·2 ≥ tw selects (cumulative weight of the i-th sorted
        // row is i, so min{v : 2i ≥ n} is row (n+1) div 2). The day rides
        // along on the k = 0 self-contribution (target == rn exists iff
        // target ≤ the user's max rn, exactly the rows the old inner join
        // kept), deleting the join, the rn localCheckpoint, and two
        // exchanges: 6 exchanges + checkpoint → 4 exchanges. Scale-safe:
        // collect_list here is bounded at 7 elements by construction.
        val daily = t.events
          .groupBy(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"))
          .agg(sum(cents(col("value"))).cast("long").as("v"))
        val rn = daily.select(col("user_id"), col("day"), col("v"),
          row_number().over(Window.partitionBy(col("user_id")).orderBy(col("day"))).as("rn"))
        val contrib = rn
          .select(col("user_id"), col("rn"), col("v"), col("day"),
            explode(sequence(lit(0), lit(6))).as("k"))
          .select(col("user_id"), (col("rn") + col("k")).as("target"), col("v"),
            when(col("k") === 0, col("day")).as("day0"))
        contrib.groupBy(col("user_id"), col("target"))
          .agg(max(col("day0")).as("day"),
            sort_array(collect_list(col("v"))).as("vs"))
          .filter(col("day").isNotNull)
          .select(col("user_id"), col("day"),
            expr("element_at(vs, cast((size(vs) + 1) div 2 as int))").as("med7_cents"))
          .orderBy(col("user_id"), col("day"))
      },
      Some("""WITH daily AS (
              |  SELECT user_id,
              |         epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
              |         CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS v
              |  FROM events GROUP BY 1, 2
              |), r AS (
              |  SELECT user_id, day, v,
              |         row_number() OVER (PARTITION BY user_id ORDER BY day) AS rn
              |  FROM daily
              |), pairs AS (
              |  SELECT a.user_id, a.rn AS target, a.day, b.v
              |  FROM r a JOIN r b ON a.user_id = b.user_id
              |    AND b.rn BETWEEN a.rn - 6 AND a.rn
              |), byv AS (
              |  SELECT user_id, target, day, v, COUNT(*) AS w
              |  FROM pairs GROUP BY 1, 2, 3, 4
              |), cum AS (
              |  SELECT user_id, target, day, v,
              |         CAST(SUM(w) OVER (PARTITION BY user_id, target
              |           ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
              |           AND CURRENT ROW) AS BIGINT) AS cw,
              |         CAST(SUM(w) OVER (PARTITION BY user_id, target)
              |           AS BIGINT) AS tw
              |  FROM byv
              |)
              |SELECT user_id, day, MIN(v) AS med7_cents
              |FROM cum WHERE cw * 2 >= tw
              |GROUP BY user_id, target, day
              |ORDER BY user_id NULLS FIRST, day NULLS FIRST""".stripMargin)),

    // Seasonal-naive forecast evaluation — the baseline every real
    // forecasting system must beat (M-competition protocol): predict
    // each day's total as the value exactly 7 days earlier, score only
    // days where that lag exists. MAE stays a non-negative integer
    // division (truncate == floor by construction); the signed bias is
    // reported as a RAW cents sum — no division — so negative totals
    // can never split truncate-vs-floor semantics across engines (the
    // q_ts_interpolate lesson). Scale shape: one corpus collapse to
    // (user, day), then an equi self-join on the collapsed relation —
    // both sides share the (user_id) exchange, no range predicate.
    "q_ts_forecast_eval" -> Q(
      t => {
        val daily = t.events
          .groupBy(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"))
          .agg(sum(cents(col("value"))).cast("long").as("v"))
          .localCheckpoint(true)
        val fc = daily.select(col("user_id").as("f_uid"),
          (col("day") + 7).as("f_day"), col("v").as("f"))
        daily.join(fc, col("user_id") === col("f_uid") && col("day") === col("f_day"))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_eval"),
            expr("sum(abs(v - f)) * 1000 div count(1)").as("mae_milli"),
            sum(col("v") - col("f")).as("bias_cents"))
          .orderBy(col("user_id"))
      },
      Some("""WITH daily AS (
              |  SELECT user_id,
              |         epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
              |         CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS v
              |  FROM events GROUP BY 1, 2
              |)
              |SELECT a.user_id, CAST(COUNT(*) AS BIGINT) AS n_eval,
              |       CAST(SUM(abs(a.v - b.v)) AS BIGINT) * 1000
              |         // CAST(COUNT(*) AS BIGINT) AS mae_milli,
              |       CAST(SUM(a.v - b.v) AS BIGINT) AS bias_cents
              |FROM daily a JOIN daily b
              |  ON a.user_id = b.user_id AND a.day = b.day + 7
              |GROUP BY a.user_id
              |ORDER BY a.user_id NULLS FIRST""".stripMargin)),

    // Inter-arrival burstiness — the telemetry statistic behind rate
    // limiting and anomaly baselining: per user, the exact lower MEDIAN
    // and 95th percentile of consecutive-event gaps (seconds), both by
    // the weighted-median crossing test (cw·2 ≥ tw / cw·20 ≥ 19·tw — no
    // percentile_cont float interpolation), plus the mean as an integer
    // division. A bursty user shows p95 ≫ median; a scheduled one shows
    // them equal. Scale shape: one lead window + rank windows on the
    // per-(user, gap) COLLAPSED relation, all on the user_id exchange.
    "q_events_inter_arrival" -> Q(
      t => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
        val gaps = t.events
          .select(col("user_id"), expr("unix_micros(ts)").as("us"), col("event_id"))
          .withColumn("next_us", lead(col("us"), 1).over(w))
          .filter(col("next_us").isNotNull)
          .select(col("user_id"), expr("(next_us - us) div 1000000").as("g"))
          .localCheckpoint(true)
        val byG = gaps.groupBy(col("user_id"), col("g")).agg(count(lit(1)).as("w"))
        val cum = Window.partitionBy(col("user_id")).orderBy(col("g"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val all = Window.partitionBy(col("user_id"))
        val ranked = byG.select(col("user_id").as("r_uid"), col("g"),
          sum(col("w")).over(cum).as("cw"), sum(col("w")).over(all).as("tw"))
        val q = ranked.groupBy(col("r_uid"))
          .agg(min(when(col("cw") * 2 >= col("tw"), col("g"))).as("median_gap_s"),
            min(when(col("cw") * 20 >= col("tw") * 19, col("g"))).as("p95_gap_s"))
        gaps.groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_gaps"),
            expr("sum(g) div count(1)").as("mean_gap_s"))
          .join(q, col("user_id") === col("r_uid"))
          .select(col("user_id"), col("n_gaps"), col("mean_gap_s"),
            col("median_gap_s"), col("p95_gap_s"))
          .orderBy(col("user_id"))
      },
      Some("""WITH gaps AS (
              |  SELECT user_id,
              |         (lead(epoch_us(CAST(ts AS TIMESTAMP)), 1) OVER (
              |            PARTITION BY user_id
              |            ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id)
              |          - epoch_us(CAST(ts AS TIMESTAMP))) // 1000000 AS g
              |  FROM events
              |), gg AS (
              |  SELECT user_id, g FROM gaps WHERE g IS NOT NULL
              |), byg AS (
              |  SELECT user_id, g, CAST(COUNT(*) AS BIGINT) AS w
              |  FROM gg GROUP BY 1, 2
              |), rk AS (
              |  SELECT user_id, g,
              |         CAST(SUM(w) OVER (PARTITION BY user_id ORDER BY g
              |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              |           AS BIGINT) AS cw,
              |         CAST(SUM(w) OVER (PARTITION BY user_id) AS BIGINT) AS tw
              |  FROM byg
              |), q AS (
              |  SELECT user_id,
              |         MIN(CASE WHEN cw * 2 >= tw THEN g END) AS median_gap_s,
              |         MIN(CASE WHEN cw * 20 >= tw * 19 THEN g END) AS p95_gap_s
              |  FROM rk GROUP BY user_id
              |), m AS (
              |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_gaps,
              |         CAST(SUM(g) AS BIGINT) // CAST(COUNT(*) AS BIGINT)
              |           AS mean_gap_s
              |  FROM gg GROUP BY user_id
              |)
              |SELECT m.user_id, m.n_gaps, m.mean_gap_s,
              |       q.median_gap_s, q.p95_gap_s
              |FROM m JOIN q ON m.user_id = q.user_id
              |ORDER BY m.user_id NULLS FIRST""".stripMargin)),

    // Time-weighted average — the billing/IoT mean where each reading
    // holds until the next one: Σ v·duration / Σ duration over the
    // lead-defined validity intervals (the q_win_scd2 interval algebra
    // feeding an aggregate instead of a dimension). The milli-precision
    // quotient is computed OVERFLOW-FREE as (q·1000 + r·1000/td) with
    // q = vd div td, r = vd mod td: Σ v·d alone can reach ~1.5·10¹⁸
    // cents·µs per user-year, so multiplying by 1000 before dividing
    // would wrap int64 — the split keeps every intermediate under
    // ~3·10¹⁶ at ANY per-user span. One window + one aggregate, both on
    // the user_id exchange.
    "q_ts_time_weighted_avg" -> Q(
      t => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
        t.events
          .select(col("user_id"), cents(col("value")).cast("long").as("v"),
            expr("unix_micros(ts)").as("us"), col("event_id"))
          .withColumn("next_us", lead(col("us"), 1).over(w))
          .filter(col("next_us").isNotNull)
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_intervals"),
            sum(col("next_us") - col("us")).as("td"),
            sum(col("v") * (col("next_us") - col("us"))).as("vd"))
          .select(col("user_id"), col("n_intervals"),
            expr("(vd div td) * 1000 + (vd % td) * 1000 div td").as("twa_milli"))
          .orderBy(col("user_id"))
      },
      Some("""WITH iv AS (
              |  SELECT user_id,
              |         CAST(floor(value * 100 + 0.5) AS BIGINT) AS v,
              |         epoch_us(CAST(ts AS TIMESTAMP)) AS us,
              |         lead(epoch_us(CAST(ts AS TIMESTAMP)), 1) OVER (
              |           PARTITION BY user_id
              |           ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS next_us
              |  FROM events
              |), m AS (
              |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_intervals,
              |         CAST(SUM(next_us - us) AS BIGINT) AS td,
              |         CAST(SUM(v * (next_us - us)) AS BIGINT) AS vd
              |  FROM iv WHERE next_us IS NOT NULL
              |  GROUP BY user_id
              |)
              |SELECT user_id, n_intervals,
              |       (vd // td) * 1000 + (vd % td) * 1000 // td AS twa_milli
              |FROM m
              |ORDER BY user_id NULLS FIRST""".stripMargin)),

    // Windowed-absence detection (cart abandonment): views with NO
    // purchase by the same user within the following day — the negated
    // funnel, which EXISTS/anti-join expresses and a window join cannot
    // (absence has no row to join). Scale shape: the view side is
    // computed once (eager checkpoint) then split by one LEFT SEMI and
    // one LEFT ANTI against the purchase stream on the SAME user_id
    // key + time-band condition — the q_join_waiting_suppliers dual-
    // correlation discipline; per-user candidate space is bounded by
    // that user's purchases. Abandonment rate in exact integer ppm.
    "q_events_abandonment" -> Q(
      t => {
        val dayUs = 86400000000L
        val views = t.events.filter(col("event_type") === "view")
          .select(col("user_id"), expr("unix_micros(ts)").as("v_us"),
            col("event_id"))
          .localCheckpoint(true)
        val purchases = t.events.filter(col("event_type") === "purchase")
          .select(col("user_id").as("p_uid"), expr("unix_micros(ts)").as("p_us"))
        val cond = col("user_id") === col("p_uid") &&
          col("p_us") >= col("v_us") && col("p_us") <= col("v_us") + dayUs
        val converted = views.join(purchases, cond, "left_semi")
          .groupBy(col("user_id")).agg(count(lit(1)).as("n_converted"))
        val abandoned = views.join(purchases, cond, "left_anti")
          .groupBy(col("user_id")).agg(count(lit(1)).as("n_abandoned"))
        views.groupBy(col("user_id")).agg(count(lit(1)).as("n_views"))
          .join(converted, Seq("user_id"), "left")
          .join(abandoned, Seq("user_id"), "left")
          .select(col("user_id"), col("n_views"),
            coalesce(col("n_converted"), lit(0L)).as("n_converted"),
            coalesce(col("n_abandoned"), lit(0L)).as("n_abandoned"),
            expr("coalesce(n_abandoned, 0) * 1000000 div n_views").as("abandon_ppm"))
          .orderBy(col("user_id"))
      },
      Some("""WITH v AS (
              |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS v_us, event_id
              |  FROM events WHERE event_type = 'view'
              |), p AS (
              |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS p_us
              |  FROM events WHERE event_type = 'purchase'
              |), flagged AS (
              |  SELECT v.user_id,
              |         CASE WHEN EXISTS (
              |           SELECT 1 FROM p
              |           WHERE p.user_id = v.user_id
              |             AND p.p_us >= v.v_us
              |             AND p.p_us <= v.v_us + 86400000000) THEN 1 ELSE 0
              |         END AS conv
              |  FROM v
              |)
              |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_views,
              |       CAST(SUM(conv) AS BIGINT) AS n_converted,
              |       CAST(SUM(1 - conv) AS BIGINT) AS n_abandoned,
              |       CAST(SUM(1 - conv) AS BIGINT) * 1000000
              |         // CAST(COUNT(*) AS BIGINT) AS abandon_ppm
              |FROM flagged GROUP BY user_id
              |ORDER BY user_id NULLS FIRST""".stripMargin)),

    // Market-basket affinity (Apriori level 2): which event types
    // co-occur within a user-day beyond chance — support, confidence,
    // and lift in exact integer ppm (lift > 1e6 means positive
    // association). The CO-OCCURRENCE complement of q_events_markov's
    // SEQUENTIAL transitions. Scale shape: collapse to distinct
    // (user-day, type) FIRST — the only corpus-sized step — then the
    // pair self-join is bounded by |types|² per basket and the final
    // count groups by a ≤|types|² key space, map-side combined. The
    // per-basket bound holds because event_type is a small closed
    // domain; Guards.boundedGroups enforces it (≤ 1024 distinct types
    // per basket) so re-pointing the query at a high-cardinality item
    // column fails loudly instead of expanding quietly.
    "q_events_basket_affinity" -> Q(
      t => {
        val ud = graft.operators.Guards.boundedGroups(
          t.events.select(
              concat(col("user_id"), lit(":"),
                expr("unix_micros(ts) div 86400000000")).as("basket"),
              col("event_type")).distinct()
            .localCheckpoint(true),
          cap = 1024,
          hint = "Apriori-2 over a high-cardinality item domain needs " +
            "frequent-item pruning (drop items below a support floor) " +
            "before the pair join.",
          col("basket"))
        val nb = ud.select(col("basket")).distinct()
          .agg(count(lit(1)).as("n_baskets"))
        val single = ud.groupBy(col("event_type")).agg(count(lit(1)).as("n_single"))
        val pairs = ud.join(
            ud.select(col("basket").as("b2"), col("event_type").as("tb")),
            col("basket") === col("b2") && col("event_type") < col("tb"))
          .groupBy(col("event_type").as("ta"), col("tb"))
          .agg(count(lit(1)).as("n_ab"))
        pairs
          .join(broadcast(single.select(col("event_type").as("ta"),
            col("n_single").as("n_a"))), "ta")
          .join(broadcast(single.select(col("event_type").as("tb"),
            col("n_single").as("n_b"))), "tb")
          .crossJoin(broadcast(nb))
          .select(col("ta"), col("tb"), col("n_ab"),
            expr("n_ab * 1000000 div n_baskets").as("support_ppm"),
            expr("n_ab * 1000000 div n_a").as("conf_ppm"),
            expr("n_ab * n_baskets * 1000000 div (n_a * n_b)").as("lift_ppm"))
          .orderBy(col("ta"), col("tb"))
      },
      Some("""WITH ud AS (
              |  SELECT DISTINCT CAST(user_id AS VARCHAR) || ':' ||
              |           CAST(epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000
              |                AS VARCHAR) AS basket,
              |         event_type
              |  FROM events
              |), nb AS (
              |  SELECT CAST(COUNT(DISTINCT basket) AS BIGINT) AS n FROM ud
              |), single AS (
              |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_single
              |  FROM ud GROUP BY event_type
              |), pairs AS (
              |  SELECT a.event_type AS ta, b.event_type AS tb,
              |         CAST(COUNT(*) AS BIGINT) AS n_ab
              |  FROM ud a JOIN ud b
              |    ON a.basket = b.basket AND a.event_type < b.event_type
              |  GROUP BY 1, 2
              |)
              |SELECT p.ta, p.tb, p.n_ab,
              |       p.n_ab * 1000000 // nb.n AS support_ppm,
              |       p.n_ab * 1000000 // sa.n_single AS conf_ppm,
              |       p.n_ab * nb.n * 1000000 // (sa.n_single * sb.n_single)
              |         AS lift_ppm
              |FROM pairs p
              |JOIN single sa ON p.ta = sa.event_type
              |JOIN single sb ON p.tb = sb.event_type
              |CROSS JOIN nb
              |ORDER BY p.ta NULLS FIRST, p.tb NULLS FIRST""".stripMargin)),

    // Wilson score interval for per-group rates — the A/B family's
    // interval estimate beside q_events_ab_ttest's point test: the
    // binomial CI that stays inside [0,1] and behaves at small n, where
    // the Wald interval collapses. Moments are exact BIGINTs (n, k);
    // the interval itself is the q_events_regression convention — one
    // FIXED sequence of IEEE ops (every divide/multiply/sqrt correctly
    // rounded, identical literals on both engines), rounded at the end.
    "q_agg_rate_ci" -> Q(
      t => {
        val m = t.events
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(when(col("value") > 100.0, 1L).otherwise(0L)).as("k"))
        val nD = col("n").cast("double")
        val pd = col("k").cast("double") / nD
        val cn = lit(3.8416) / nD
        val denom = lit(1.0) + cn
        val center = (pd + cn / 2.0) / denom
        val half = (lit(1.96) * sqrt(pd * (lit(1.0) - pd) / nD + cn / (lit(4.0) * nD))) / denom
        m.select(col("event_type"), col("n"), col("k"),
            round(center - half, 6).as("ci_lo"),
            round(center + half, 6).as("ci_hi"))
          .orderBy(col("event_type"))
      },
      Some("""WITH m AS (
              |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
              |         CAST(SUM(CASE WHEN value > 100.0 THEN 1 ELSE 0 END)
              |              AS BIGINT) AS k
              |  FROM events GROUP BY event_type
              |)
              |SELECT event_type, n, k,
              |       ROUND(((CAST(k AS DOUBLE) / CAST(n AS DOUBLE)
              |           + (3.8416 / CAST(n AS DOUBLE)) / 2.0)
              |         / (1.0 + 3.8416 / CAST(n AS DOUBLE))
              |         - (1.96 * sqrt((CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
              |             * (1.0 - CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
              |             / CAST(n AS DOUBLE)
              |             + (3.8416 / CAST(n AS DOUBLE))
              |               / (4.0 * CAST(n AS DOUBLE))))
              |           / (1.0 + 3.8416 / CAST(n AS DOUBLE))) * 1000000)
              |         / 1000000 AS ci_lo,
              |       ROUND(((CAST(k AS DOUBLE) / CAST(n AS DOUBLE)
              |           + (3.8416 / CAST(n AS DOUBLE)) / 2.0)
              |         / (1.0 + 3.8416 / CAST(n AS DOUBLE))
              |         + (1.96 * sqrt((CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
              |             * (1.0 - CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
              |             / CAST(n AS DOUBLE)
              |             + (3.8416 / CAST(n AS DOUBLE))
              |               / (4.0 * CAST(n AS DOUBLE))))
              |           / (1.0 + 3.8416 / CAST(n AS DOUBLE))) * 1000000)
              |         / 1000000 AS ci_hi
              |FROM m
              |ORDER BY event_type NULLS FIRST""".stripMargin)),

    // CUSUM change-point detection — the sequential drift monitor
    // (Page 1954) whose textbook form S_t = max(0, S_{t-1} + dev_t) is a
    // RECURSION no window frame expresses directly; the engine uses the
    // prefix-sum identity S_t = P_t − min(0, min_{j≤t} P_j) (P = running
    // dev sum), which turns the recursion into TWO stacked windows on one
    // (user) sort — running sum, then running min over it. Deviations are
    // exact milli-cents against the user's own mean (integer div), the
    // alarm threshold is 5 mean-days of cumulative excess, and the output
    // reports each user's peak statistic and FIRST alarm day (null when
    // never crossed). Scale shape: per-user daily collapse, then both
    // windows share a single user_id exchange + in-partition sort.
    "q_ts_cusum" -> Q(
      t => {
        // daily feeds both the deviation stream and the per-user mean —
        // eager checkpoint so the corpus scan + collapse run once
        val daily = t.events
          .groupBy(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"))
          .agg(sum(cents(col("value"))).cast("long").as("v"))
          .localCheckpoint(true)
        val m = daily.groupBy(col("user_id").as("m_uid"))
          .agg(expr("sum(v) * 1000 div count(1)").as("mean_milli"))
        val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val scored = daily.join(m, col("user_id") === col("m_uid"))
          .select(col("user_id"), col("day"), col("mean_milli"),
            (col("v") * 1000 - col("mean_milli")).as("dev"))
          .withColumn("p", sum(col("dev")).over(w))
          .withColumn("s", col("p") - least(min(col("p")).over(w), lit(0L)))
        scored
          .groupBy(col("user_id"))
          .agg(max(col("s")).as("max_cusum_milli"),
            min(when(col("s") > col("mean_milli") * 5, col("day"))).as("first_alarm_day"))
          .orderBy(col("user_id"))
      },
      Some("""WITH daily AS (
              |  SELECT user_id,
              |         epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
              |         CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS v
              |  FROM events GROUP BY 1, 2
              |), m AS (
              |  SELECT user_id, CAST(SUM(v) AS BIGINT) * 1000
              |           // CAST(COUNT(*) AS BIGINT) AS mean_milli
              |  FROM daily GROUP BY user_id
              |), pfx AS (
              |  SELECT d.user_id, d.day, m.mean_milli,
              |         CAST(SUM(d.v * 1000 - m.mean_milli) OVER (
              |           PARTITION BY d.user_id ORDER BY d.day
              |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              |         AS BIGINT) AS p
              |  FROM daily d JOIN m ON d.user_id = m.user_id
              |), s AS (
              |  SELECT user_id, day, mean_milli,
              |         p - LEAST(CAST(MIN(p) OVER (
              |           PARTITION BY user_id ORDER BY day
              |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              |         AS BIGINT), 0) AS cusum
              |  FROM pfx
              |)
              |SELECT user_id, MAX(cusum) AS max_cusum_milli,
              |       MIN(CASE WHEN cusum > mean_milli * 5 THEN day END)
              |         AS first_alarm_day
              |FROM s GROUP BY user_id
              |ORDER BY user_id NULLS FIRST""".stripMargin)),

    // Kaplan–Meier risk table — survival analysis's exact-integer data
    // product (time-to-conversion from signup, administratively censored
    // at the observation horizon): per duration day, the number at risk,
    // events, and censorings. Deliberately the TABLE, not the survival
    // curve: the K-M product Π(1 − d/n) needs float products (or log
    // sums — libm, banned by the determinism rules), while the table IS
    // the estimator's sufficient statistic and stays BIGINT end-to-end.
    // at_risk(d) = Σ_{d'≥d} cohort(d') falls out of one
    // current-row-to-unbounded-following window over the duration-
    // collapsed relation (distinct durations, not users). Scale shape:
    // two user-keyed aggregates + one broadcast horizon scalar + a
    // global window on the tiny collapsed table.
    "q_events_survival" -> Q(
      t => {
        val ev = t.events.select(col("user_id"), col("event_type"),
          expr("unix_micros(ts)").as("us"))
        val signup = ev.filter(col("event_type") === "signup")
          .groupBy(col("user_id")).agg(min(col("us")).as("s_us"))
          .localCheckpoint(true)
        val firstPurchase = ev.filter(col("event_type") === "purchase")
          .join(signup, "user_id")
          .filter(col("us") >= col("s_us"))
          .groupBy(col("user_id").as("p_uid")).agg(min(col("us")).as("p_us"))
        val horizon = ev.agg(max(col("us")).as("t_max"))
        val durations = signup
          .join(firstPurchase, col("user_id") === col("p_uid"), "left")
          .crossJoin(broadcast(horizon))
          .select(
            expr("(coalesce(p_us, t_max) - s_us) div 86400000000").as("d"),
            when(col("p_us").isNotNull, 1L).otherwise(0L).as("event"))
        val byD = durations.groupBy(col("d"))
          .agg(sum(col("event")).as("n_events"),
            sum(lit(1L) - col("event")).as("n_censored"))
        val wAtRisk = Window.orderBy(col("d"))
          .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        byD.select(col("d"),
            sum(col("n_events") + col("n_censored")).over(wAtRisk).as("at_risk"),
            col("n_events"), col("n_censored"))
          .orderBy(col("d"))
      },
      Some("""WITH ev AS (
              |  SELECT user_id, event_type,
              |         epoch_us(CAST(ts AS TIMESTAMP)) AS us
              |  FROM events
              |), signup AS (
              |  SELECT user_id, MIN(us) AS s_us FROM ev
              |  WHERE event_type = 'signup' GROUP BY user_id
              |), fp AS (
              |  SELECT e.user_id, MIN(e.us) AS p_us
              |  FROM ev e JOIN signup s ON e.user_id = s.user_id
              |  WHERE e.event_type = 'purchase' AND e.us >= s.s_us
              |  GROUP BY e.user_id
              |), horizon AS (
              |  SELECT MAX(us) AS t_max FROM ev
              |), dur AS (
              |  SELECT (coalesce(f.p_us, h.t_max) - s.s_us) // 86400000000 AS d,
              |         CASE WHEN f.p_us IS NOT NULL THEN 1 ELSE 0 END AS event
              |  FROM signup s
              |  LEFT JOIN fp f ON s.user_id = f.user_id
              |  CROSS JOIN horizon h
              |), byd AS (
              |  SELECT d, CAST(SUM(event) AS BIGINT) AS n_events,
              |         CAST(SUM(1 - event) AS BIGINT) AS n_censored
              |  FROM dur GROUP BY d
              |)
              |SELECT d,
              |       CAST(SUM(n_events + n_censored) OVER (
              |         ORDER BY d ROWS BETWEEN CURRENT ROW
              |         AND UNBOUNDED FOLLOWING) AS BIGINT) AS at_risk,
              |       n_events, n_censored
              |FROM byd
              |ORDER BY d NULLS FIRST""".stripMargin)),

    // Hour-of-day × day-of-week activity heatmap — the seasonality
    // profile behind capacity planning and anomaly baselining (the
    // static complement of q_ts_cusum's sequential alarm). One two-key
    // hash aggregate with partial combine; dow aligned across engines by
    // shifting DuckDB's 0-based Sunday to Spark's 1-based.
    "q_events_heatmap" -> Q(
      t => t.events
        .groupBy(dayofweek(col("ts")).cast("long").as("dow"),
          hour(col("ts")).cast("long").as("hr"))
        .agg(count(lit(1)).as("n"),
          sum(cents(col("value"))).cast("long").as("cents"))
        .orderBy(col("dow"), col("hr")),
      Some("""SELECT CAST(dayofweek(CAST(ts AS TIMESTAMP)) + 1 AS BIGINT) AS dow,
              |       CAST(hour(CAST(ts AS TIMESTAMP)) AS BIGINT) AS hr,
              |       CAST(COUNT(*) AS BIGINT) AS n,
              |       CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
              |         AS cents
              |FROM events
              |GROUP BY 1, 2
              |ORDER BY dow NULLS FIRST, hr NULLS FIRST""".stripMargin)),

    // Theil–Sen robust trend — the median of all pairwise slopes, the
    // estimator OLS regression (q_events_regression) is not: one outlier
    // day bends a least-squares slope arbitrarily, while the pairwise-
    // slope median tolerates ~29% contamination. Slopes quantize to
    // integer milli-cents/day (truncating div, non-negative denominator
    // by construction d2 > d1) so the median rides the standard crossing
    // test — no rational-number ordering needed. Scale note: the pair
    // expansion is quadratic in DAYS PER USER (bounded: Σ|user-days|²
    // per user, ~70² here); long series first downsample to
    // weekly/monthly points — the estimator's accepted practice — or
    // switch to the repeated-median variant with the same machinery.
    // That precondition is ENFORCED by Guards.boundedGroups over the
    // checkpointed daily relation (≤ 4096 days/user ≈ 11 years of daily
    // points, ~8.4M pairs for the one worst user — the loud-failure
    // line past which the caller must pre-downsample).
    "q_ts_theil_sen" -> Q(
      t => {
        val daily = graft.operators.Guards.boundedGroups(
          t.events
            .groupBy(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"))
            .agg(sum(cents(col("value"))).cast("long").as("v"))
            .localCheckpoint(true),
          cap = 4096,
          hint = "Downsample the series to weekly/monthly points before " +
            "Theil-Sen (the estimator's accepted practice for long series).",
          col("user_id"))
        val slopes = daily
          .join(daily.select(col("user_id").as("u2"), col("day").as("d2"),
            col("v").as("v2")),
            col("user_id") === col("u2") && col("day") < col("d2"))
          .select(col("user_id"),
            // slopes go NEGATIVE: explicit floor division (num − pmod)
            // so Spark's truncating div can't split from DuckDB's
            // flooring // — the q_ts_interpolate lesson
            expr("((v2 - v) * 1000 - pmod((v2 - v) * 1000, d2 - day))" +
              " div (d2 - day)").as("s"))
        val byS = slopes.groupBy(col("user_id"), col("s")).agg(count(lit(1)).as("w"))
        val cum = Window.partitionBy(col("user_id")).orderBy(col("s"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val all = Window.partitionBy(col("user_id"))
        byS.select(col("user_id"), col("s"),
            sum(col("w")).over(cum).as("cw"), sum(col("w")).over(all).as("tw"))
          .filter(col("cw") * 2 >= col("tw"))
          .groupBy(col("user_id"))
          .agg(min(col("s")).as("slope_milli_per_day"), max(col("tw")).as("n_pairs"))
          .orderBy(col("user_id"))
      },
      Some("""WITH daily AS (
              |  SELECT user_id,
              |         epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
              |         CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS v
              |  FROM events GROUP BY 1, 2
              |), slopes AS (
              |  -- explicit floor division (non-negative remainder form):
              |  -- DuckDB's // truncates toward zero on negative operands
              |  SELECT a.user_id,
              |         ((b.v - a.v) * 1000
              |           - (((b.v - a.v) * 1000 % (b.day - a.day))
              |              + (b.day - a.day)) % (b.day - a.day))
              |           // (b.day - a.day) AS s
              |  FROM daily a JOIN daily b
              |    ON a.user_id = b.user_id AND a.day < b.day
              |), bys AS (
              |  SELECT user_id, s, CAST(COUNT(*) AS BIGINT) AS w
              |  FROM slopes GROUP BY 1, 2
              |), rk AS (
              |  SELECT user_id, s,
              |         CAST(SUM(w) OVER (PARTITION BY user_id ORDER BY s
              |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              |           AS BIGINT) AS cw,
              |         CAST(SUM(w) OVER (PARTITION BY user_id) AS BIGINT) AS tw
              |  FROM bys
              |)
              |SELECT user_id, MIN(s) AS slope_milli_per_day,
              |       MAX(tw) AS n_pairs
              |FROM rk WHERE cw * 2 >= tw
              |GROUP BY user_id
              |ORDER BY user_id NULLS FIRST""".stripMargin)),

    // Rolling lag-1 autocorrelation — the regime-shift indicator next to
    // q_ts_cusum's level-shift alarm: over each trailing 14-day window of
    // (today, yesterday) pairs, the Pearson r of the q_events_regression
    // convention (exact BIGINT moments from SIX same-frame window sums
    // sharing one sort, fixed-op-order double only at the very end,
    // zero-variance windows null). Rolling second-moment statistics are
    // the frame-expressible complement of the rolling MEDIAN's rank
    // rewrite: here plain ROWS frames suffice, so the whole query is one
    // user-keyed exchange + one in-partition sort. Full windows only
    // (n = 14) so every reported r is comparable.
    "q_win_rolling_corr" -> Q(
      t => {
        val daily = t.events
          .groupBy(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"))
          .agg(sum(cents(col("value"))).cast("long").as("v"))
        val w1 = Window.partitionBy(col("user_id")).orderBy(col("day"))
        val w14 = Window.partitionBy(col("user_id")).orderBy(col("day"))
          .rowsBetween(-13, 0)
        val mo = daily
          .withColumn("x", lag(col("v"), 1).over(w1))
          .filter(col("x").isNotNull)
          .select(col("user_id"), col("day"),
            count(lit(1)).over(w14).as("n"),
            sum(col("v")).over(w14).as("sy"),
            sum(col("x")).over(w14).as("sx"),
            sum(col("v") * col("x")).over(w14).as("sxy"),
            sum(col("v") * col("v")).over(w14).as("syy"),
            sum(col("x") * col("x")).over(w14).as("sxx"))
          .filter(col("n") === 14)
        val nD = col("n").cast("double")
        val cov = nD * col("sxy") - col("sx").cast("double") * col("sy")
        val varX = nD * col("sxx") - col("sx").cast("double") * col("sx")
        val varY = nD * col("syy") - col("sy").cast("double") * col("sy")
        mo.select(col("user_id"), col("day"),
            when(varX > 0 && varY > 0, round(cov / sqrt(varX * varY), 6))
              .otherwise(lit(null).cast("double")).as("r14"))
          .orderBy(col("user_id"), col("day"))
      },
      Some("""WITH daily AS (
              |  SELECT user_id,
              |         epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
              |         CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS v
              |  FROM events GROUP BY 1, 2
              |), p AS (
              |  SELECT user_id, day, v,
              |         lag(v, 1) OVER (PARTITION BY user_id ORDER BY day) AS x
              |  FROM daily
              |), mo AS (
              |  SELECT user_id, day,
              |         CAST(COUNT(*) OVER w AS BIGINT) AS n,
              |         CAST(SUM(v) OVER w AS BIGINT) AS sy,
              |         CAST(SUM(x) OVER w AS BIGINT) AS sx,
              |         CAST(SUM(v * x) OVER w AS BIGINT) AS sxy,
              |         CAST(SUM(v * v) OVER w AS BIGINT) AS syy,
              |         CAST(SUM(x * x) OVER w AS BIGINT) AS sxx
              |  FROM p WHERE x IS NOT NULL
              |  WINDOW w AS (PARTITION BY user_id ORDER BY day
              |                 ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
              |)
              |SELECT user_id, day,
              |       CASE WHEN CAST(n AS DOUBLE) * sxx
              |                   - CAST(sx AS DOUBLE) * sx > 0
              |             AND CAST(n AS DOUBLE) * syy
              |                   - CAST(sy AS DOUBLE) * sy > 0
              |            THEN ROUND((CAST(n AS DOUBLE) * sxy
              |                - CAST(sx AS DOUBLE) * sy)
              |              / sqrt((CAST(n AS DOUBLE) * sxx
              |                  - CAST(sx AS DOUBLE) * sx)
              |                * (CAST(n AS DOUBLE) * syy
              |                  - CAST(sy AS DOUBLE) * sy)) * 1000000) / 1000000
              |            ELSE NULL END AS r14
              |FROM mo WHERE n = 14
              |ORDER BY user_id NULLS FIRST, day NULLS FIRST""".stripMargin)),

    // Autocorrelation function (ACF lags 1..5) per user — the global
    // companion of q_win_rolling_corr's ROLLING lag-1 r: one Pearson r
    // per (user, lag) over the user's whole daily series, the series
    // profile that picks seasonality periods and AR orders. Pairs are
    // calendar-lagged (a pair exists iff BOTH day and day-k have data —
    // join semantics, not row-shift), so gaps don't smear lags. Exact
    // BIGINT moments, one fixed-op-order double at the end (the
    // q_events_regression convention); degenerate/zero-variance groups
    // null out. Scale shape: the 5 lags ride ONE 5×-explode + one
    // (user, prev-day) equi-join + one (user, lag) hash aggregate — no
    // per-lag passes, no window sort; linear in user-days.
    "q_ts_acf" -> Q(
      t => {
        val daily = t.events
          .groupBy(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"))
          .agg(sum(cents(col("value"))).cast("long").as("v"))
        val lagged = daily
          .select(col("user_id"), col("day"), col("v"),
            explode(sequence(lit(1), lit(5))).as("lag"))
          .withColumn("pday", col("day") - col("lag"))
        val pairs = lagged.join(
          daily.select(col("user_id").as("u2"), col("day").as("pday2"),
            col("v").as("x")),
          col("user_id") === col("u2") && col("pday") === col("pday2"))
        val mo = pairs.groupBy(col("user_id"), col("lag"))
          .agg(count(lit(1)).as("n"),
            sum(col("v")).as("sy"), sum(col("x")).as("sx"),
            sum(col("v") * col("x")).as("sxy"),
            sum(col("v") * col("v")).as("syy"),
            sum(col("x") * col("x")).as("sxx"))
          .filter(col("n") >= 10)
        val nD = col("n").cast("double")
        val cov = nD * col("sxy") - col("sx").cast("double") * col("sy")
        val varX = nD * col("sxx") - col("sx").cast("double") * col("sx")
        val varY = nD * col("syy") - col("sy").cast("double") * col("sy")
        mo.select(col("user_id"), col("lag").cast("long").as("lag"),
            col("n").as("n_pairs"),
            when(varX > 0 && varY > 0, round(cov / sqrt(varX * varY), 6))
              .otherwise(lit(null).cast("double")).as("r"))
          .orderBy(col("user_id"), col("lag"))
      },
      Some("""WITH daily AS (
              |  SELECT user_id,
              |         epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
              |         CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS v
              |  FROM events GROUP BY 1, 2
              |), pairs AS (
              |  SELECT a.user_id, t.lag, a.v, b.v AS x
              |  FROM daily a
              |  CROSS JOIN range(1, 6) AS t(lag)
              |  JOIN daily b ON b.user_id = a.user_id AND b.day = a.day - t.lag
              |), mo AS (
              |  SELECT user_id, CAST(lag AS BIGINT) AS lag,
              |         CAST(COUNT(*) AS BIGINT) AS n,
              |         CAST(SUM(v) AS BIGINT) AS sy, CAST(SUM(x) AS BIGINT) AS sx,
              |         CAST(SUM(v * x) AS BIGINT) AS sxy,
              |         CAST(SUM(v * v) AS BIGINT) AS syy,
              |         CAST(SUM(x * x) AS BIGINT) AS sxx
              |  FROM pairs GROUP BY 1, 2 HAVING COUNT(*) >= 10
              |)
              |SELECT user_id, lag, n AS n_pairs,
              |       CASE WHEN CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx > 0
              |             AND CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy > 0
              |            THEN ROUND((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
              |              / sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
              |                * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))
              |              * 1000000) / 1000000
              |            ELSE NULL END AS r
              |FROM mo
              |ORDER BY user_id NULLS FIRST, lag NULLS FIRST""".stripMargin)),

    // Day-of-week seasonal index — the decomposition primitive under
    // gapfill/forecast-eval: each weekday's share of daily volume as
    // EXACT integer basis points, index_bp = (sum_dow·N·10⁴) div
    // (n_dow·S) — a single product form, so no intermediate truncating
    // division leaks precision. dow is pure day arithmetic
    // (pmod(day+4, 7), 0 = Sunday; day 0 = Thursday 1970-01-01) — no
    // engine dayofweek() dialect dependence. Scale shape: one daily
    // collapse (map-side combined), then a 7-row aggregate with its
    // grand totals taken by a window over those 7 rows — nothing
    // driver-side, nothing quadratic.
    "q_ts_seasonal_dow" -> Q(
      t => {
        val daily = t.events
          .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
          .agg(sum(cents(col("value"))).cast("long").as("v"))
        val dow = daily
          .groupBy(pmod(col("day") + 4, lit(7)).cast("long").as("dow"))
          .agg(count(lit(1)).as("n_days"), sum(col("v")).as("sum_v"))
        val wAll = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        dow.select(col("dow"), col("n_days"),
            sum(col("n_days")).over(wAll).as("nn"),
            sum(col("sum_v")).over(wAll).as("ss"), col("sum_v"))
          .select(col("dow"), col("n_days"),
            expr("sum_v div n_days").as("avg_cents"),
            expr("sum_v * nn * 10000 div (n_days * ss)").as("index_bp"))
          .orderBy(col("dow"))
      },
      Some("""WITH daily AS (
              |  SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
              |         CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS v
              |  FROM events GROUP BY 1
              |), dw AS (
              |  SELECT CAST((day + 4) % 7 AS BIGINT) AS dow,
              |         CAST(COUNT(*) AS BIGINT) AS n_days,
              |         CAST(SUM(v) AS BIGINT) AS sum_v
              |  FROM daily GROUP BY 1
              |)
              |SELECT dow, n_days,
              |       CAST(sum_v // n_days AS BIGINT) AS avg_cents,
              |       CAST(sum_v * (SELECT SUM(n_days) FROM dw) * 10000
              |            // (n_days * (SELECT SUM(sum_v) FROM dw)) AS BIGINT) AS index_bp
              |FROM dw
              |ORDER BY dow NULLS FIRST""".stripMargin)),

    // Calibration / reliability bins (the ECE decomposition a quality-
    // classifier pipeline reports before its scores gate training data):
    // a deterministic monotone score in basis points stands in for the
    // model probability (capped cents(value)/10 — the COMPUTATION is the
    // subject; swap in a real model column at will), outcome = purchase.
    // Per decile bin: exact integer mean predicted bp, realized positive
    // rate bp, absolute gap, and the n·gap weight whose sum/N is ECE.
    // One map-side projection + one ≤10-group aggregate; nothing scales
    // with users or history length.
    "q_events_calibration" -> Q(
      t => {
        val scored = t.events.select(
          least(lit(9999L), expr("cast(floor(value * 100 + 0.5) as bigint) div 10")).as("p_bp"),
          when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"))
        scored
          .groupBy(expr("p_bp div 1000").as("bin"))
          .agg(count(lit(1)).as("n"), sum(col("p_bp")).as("sp"), sum(col("y")).as("pos"))
          .select(col("bin"), col("n"),
            expr("sp div n").as("avg_pred_bp"),
            expr("pos * 10000 div n").as("pos_rate_bp"),
            abs(expr("sp div n") - expr("pos * 10000 div n")).as("gap_bp"),
            (col("n") * abs(expr("sp div n") - expr("pos * 10000 div n"))).as("gap_weight"))
          .orderBy(col("bin"))
      },
      Some("""WITH scored AS (
              |  SELECT LEAST(9999, CAST(floor(value * 100 + 0.5) AS BIGINT) // 10) AS p_bp,
              |         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
              |  FROM events
              |), b AS (
              |  SELECT p_bp // 1000 AS bin, CAST(COUNT(*) AS BIGINT) AS n,
              |         CAST(SUM(p_bp) AS BIGINT) AS sp, CAST(SUM(y) AS BIGINT) AS pos
              |  FROM scored GROUP BY 1
              |)
              |SELECT CAST(bin AS BIGINT) AS bin, n,
              |       CAST(sp // n AS BIGINT) AS avg_pred_bp,
              |       CAST(pos * 10000 // n AS BIGINT) AS pos_rate_bp,
              |       CAST(abs(sp // n - pos * 10000 // n) AS BIGINT) AS gap_bp,
              |       CAST(n * abs(sp // n - pos * 10000 // n) AS BIGINT) AS gap_weight
              |FROM b
              |ORDER BY bin NULLS FIRST""".stripMargin)),

    // Log2 (power-of-two) histogram — the latency-style distribution
    // profile for heavy-tailed values, where equi-width bins
    // (q_agg_histogram) waste resolution on the tail: bucket =
    // ⌊log2(x)⌋+1 computed EXACTLY as the binary-string length (both
    // engines' bin() — no log2() float boundary, per the no-libm rule).
    // One per-user collapse + one ≤64-group map-side-combined count.
    "q_agg_histogram_log2" -> Q(
      t => {
        val per = t.events.groupBy(col("user_id"))
          .agg(sum(cents(col("value"))).cast("long").as("x"))
        per.select(length(bin(col("x"))).cast("long").as("bucket"))
          .groupBy(col("bucket")).agg(count(lit(1)).as("n_users"))
          .orderBy(col("bucket"))
      },
      Some("""WITH per AS (
              |  SELECT user_id,
              |         CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS x
              |  FROM events GROUP BY user_id
              |)
              |SELECT CAST(length(bin(x)) AS BIGINT) AS bucket,
              |       CAST(COUNT(*) AS BIGINT) AS n_users
              |FROM per GROUP BY 1
              |ORDER BY bucket NULLS FIRST""".stripMargin)),

    // Gini concentration coefficient of per-user spend — the inequality
    // statistic behind "do 1% of users drive 90% of volume", which
    // decides whether per-user partitioning needs salting the same way
    // q_graph_degree_dist's hub tail does for joins. Exact rank formula
    // G = (2·Σi·xᵢ − (n+1)·Σx) / (n·Σx) over ascending-sorted totals,
    // reported in integer basis points: Σi·xᵢ is invariant under tie
    // permutations (equal x within a tie block), so the (x, user_id)
    // sort is deterministic. Scale shape (r19 unpartitioned-window
    // audit): the global rank runs through
    // Partitioning.globalRowNumber's two-pass range-partitioned plan —
    // the per-user relation is USER-sized, and the old
    // row_number().over(Window.orderBy(...)) moved every user through
    // ONE partition. The (x, user_id) order is unique, so the two-pass
    // rank is bit-identical to the single-partition one (the oracle
    // keeps the plain OVER (ORDER BY) spelling as the equivalence gate).
    // Overflow bound: the ×10⁴ numerator stays under int64 while
    // n·Σx < 9·10¹⁴ — switch the two final products to DECIMAL(38,0)
    // beyond that.
    "q_events_gini" -> Q(
      t => {
        val per = t.events.groupBy(col("user_id"))
          .agg(sum(cents(col("value"))).cast("long").as("x"))
        val ranked = graft.operators.Partitioning.globalRowNumber(
          per, Seq(col("x"), col("user_id")), "i")
        ranked.agg(count(lit(1)).as("n_users"), sum(col("x")).as("total_cents"),
            sum(col("x") * col("i")).as("sxi"))
          .select(col("n_users"), col("total_cents"),
            expr("(2 * sxi - (n_users + 1) * total_cents) * 10000" +
              " div (n_users * total_cents)").as("gini_bp"))
      },
      Some("""WITH per AS (
              |  SELECT user_id,
              |         CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS x
              |  FROM events GROUP BY user_id
              |), ranked AS (
              |  SELECT x, CAST(row_number() OVER (ORDER BY x, user_id) AS BIGINT) AS i
              |  FROM per
              |), m AS (
              |  SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
              |         CAST(SUM(x) AS BIGINT) AS total_cents,
              |         CAST(SUM(x * i) AS BIGINT) AS sxi
              |  FROM ranked
              |)
              |SELECT n_users, total_cents,
              |       (2 * sxi - (n_users + 1) * total_cents) * 10000
              |         // (n_users * total_cents) AS gini_bp
              |FROM m""".stripMargin)),

    // Winsorization — the robust-cleaning transform that CLIPS instead of
    // dropping (q_events_mad_outliers flags, this repairs): per-user
    // exact 5th/95th percentiles by the weighted-median crossing test
    // generalized to any quantile (p05 = smallest v with 20·cw ≥ tw,
    // p95 = smallest v with 20·cw ≥ 19·tw — ceil semantics, pure
    // BIGINT, no percentile_cont interpolation float), then every value
    // clamps into [p05, p95]. Scale shape: the rank windows run on the
    // per-(user, value) COLLAPSED relation; the clip is one broadcast-or-
    // shuffled join back on user_id + a map; output compares raw vs
    // winsorized exact sums per user.
    "q_events_winsorize" -> Q(
      t => {
        val ev = t.events.select(col("user_id"), cents(col("value")).cast("long").as("v"))
          .localCheckpoint(true)
        val byVal = ev.groupBy(col("user_id"), col("v")).agg(count(lit(1)).as("w"))
        val cum = Window.partitionBy(col("user_id")).orderBy(col("v"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val all = Window.partitionBy(col("user_id"))
        val ranked = byVal.select(col("user_id").as("q_uid"), col("v"),
          sum(col("w")).over(cum).as("cw"), sum(col("w")).over(all).as("tw"))
        val quantiles = ranked
          .groupBy(col("q_uid"))
          .agg(min(when(col("cw") * 20 >= col("tw"), col("v"))).as("p05"),
            min(when(col("cw") * 20 >= col("tw") * 19, col("v"))).as("p95"))
        ev.join(quantiles, col("user_id") === col("q_uid"))
          .select(col("user_id"), col("v"),
            greatest(col("p05"), least(col("p95"), col("v"))).as("vw"))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n"), sum(col("v")).as("sum_raw_cents"),
            sum(col("vw")).as("sum_wins_cents"))
          .orderBy(col("user_id"))
      },
      Some("""WITH ev AS (
              |  SELECT user_id, CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
              |  FROM events
              |), byv AS (
              |  SELECT user_id, v, CAST(COUNT(*) AS BIGINT) AS w
              |  FROM ev GROUP BY 1, 2
              |), rk AS (
              |  SELECT user_id, v,
              |         CAST(SUM(w) OVER (PARTITION BY user_id ORDER BY v
              |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              |           AS BIGINT) AS cw,
              |         CAST(SUM(w) OVER (PARTITION BY user_id) AS BIGINT) AS tw
              |  FROM byv
              |), q AS (
              |  SELECT user_id,
              |         MIN(CASE WHEN cw * 20 >= tw THEN v END) AS p05,
              |         MIN(CASE WHEN cw * 20 >= tw * 19 THEN v END) AS p95
              |  FROM rk GROUP BY user_id
              |)
              |SELECT e.user_id, CAST(COUNT(*) AS BIGINT) AS n,
              |       CAST(SUM(e.v) AS BIGINT) AS sum_raw_cents,
              |       CAST(SUM(GREATEST(q.p05, LEAST(q.p95, e.v))) AS BIGINT)
              |         AS sum_wins_cents
              |FROM ev e JOIN q ON e.user_id = q.user_id
              |GROUP BY e.user_id
              |ORDER BY e.user_id NULLS FIRST""".stripMargin)),

    // Lorenz curve deciles — the distributional detail behind
    // q_events_gini's single number: users ranked by spend into exact
    // ntile(10) buckets, each decile's share of total in integer ppm
    // (the "bottom 50% hold X%" readout). Ranking runs on the per-user
    // COLLAPSED relation; the total is one broadcast scalar.
    // Scale shape (r19 unpartitioned-window audit): the ntile rides
    // Partitioning.globalRowNumber's two-pass range-partitioned rank +
    // the closed-form ntileFromRank bucket formula instead of
    // ntile(10).over(Window.orderBy(...)), which moved every user
    // through ONE partition. (x, user_id) is a unique total order and
    // the formula reproduces SQL ntile semantics exactly (pinned in
    // PrefixMaxSpec against Spark's own ntile; the oracle keeps the
    // plain OVER (ORDER BY) spelling as the cross-engine gate). The
    // total row count rides the same broadcast scalar as the sum.
    "q_events_lorenz" -> Q(
      t => {
        val per = t.events.groupBy(col("user_id"))
          .agg(sum(cents(col("value"))).cast("long").as("x"))
          .localCheckpoint(true)
        val tot = per.agg(sum(col("x")).as("total"), count(lit(1)).as("__n"))
        graft.operators.Partitioning.globalRowNumber(
            per, Seq(col("x"), col("user_id")), "__i")
          .crossJoin(broadcast(tot))
          .select(col("x"), col("total"),
            graft.operators.Partitioning.ntileFromRank(
              col("__i"), col("__n"), 10).cast("long").as("decile"))
          .groupBy(col("decile"))
          .agg(count(lit(1)).as("n_users"), sum(col("x")).as("decile_cents"),
            expr("sum(x) * 1000000 div max(total)").as("share_ppm"))
          .orderBy(col("decile"))
      },
      Some("""WITH per AS (
              |  SELECT user_id,
              |         CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS x
              |  FROM events GROUP BY user_id
              |), tot AS (
              |  SELECT CAST(SUM(x) AS BIGINT) AS total FROM per
              |), d AS (
              |  SELECT x, CAST(ntile(10) OVER (ORDER BY x, user_id) AS BIGINT) AS decile
              |  FROM per
              |)
              |SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_users,
              |       CAST(SUM(x) AS BIGINT) AS decile_cents,
              |       CAST(SUM(x) AS BIGINT) * 1000000
              |         // CAST(MAX(t.total) AS BIGINT) AS share_ppm
              |FROM d CROSS JOIN tot t
              |GROUP BY decile
              |ORDER BY decile NULLS FIRST""".stripMargin)),

    // Robust per-user outlier detection via MAD (median absolute
    // deviation) — the robust-statistics twin of q_events_outliers' 2σ
    // rule: a single whale purchase inflates a user's σ enough to hide
    // real anomalies, while the median/MAD pair is unmoved by any minority
    // of extreme values. Entirely exact BIGINT: the median is the LOWER
    // median by the same crossing test as q_agg_weighted_median (smallest
    // v with 2·cumweight ≥ total — no averaging of middle pairs, no
    // float), MAD is the lower median of |v − med|, and the flag is the
    // integer comparison dev > 3·MAD. Scale shape: three user-keyed hash
    // aggregates + two windows that run on the per-(user, value) COLLAPSED
    // relation (bounded by distinct values per user, not events), and two
    // small joins back — every exchange is on user_id, so AQE reuses the
    // partitioning. The oracle restates both crossing tests independently.
    "q_events_mad_outliers" -> Q(
      t => {
        val ev = t.events.select(col("user_id"), cents(col("value")).cast("long").as("v"))
        def lowerMedian(df: org.apache.spark.sql.DataFrame, out: String) = {
          val byVal = df.groupBy(col("user_id"), col("v")).agg(count(lit(1)).as("w"))
          val cum = Window.partitionBy(col("user_id")).orderBy(col("v"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
          val all = Window.partitionBy(col("user_id"))
          byVal.select(col("user_id"), col("v"),
              sum(col("w")).over(cum).as("cw"), sum(col("w")).over(all).as("tw"))
            .filter(col("cw") * 2 >= col("tw"))
            .groupBy(col("user_id")).agg(min(col("v")).as(out))
        }
        val med = lowerMedian(ev, "med_c")
        // dev feeds BOTH the MAD derivation and the final tally — eager
        // checkpoint so the scan + median join run once, not per consumer
        // (the q_join_waiting_suppliers multi-arm discipline)
        val dev = ev.join(med, "user_id")
          .withColumn("dev", abs(col("v") - col("med_c")))
          .localCheckpoint(true)
        val mad = lowerMedian(dev.select(col("user_id"), col("dev").as("v")), "mad_c")
        dev.join(mad, "user_id")
          .groupBy(col("user_id"))
          .agg(min(col("med_c")).as("med_c"), min(col("mad_c")).as("mad_c"),
            sum(when(col("dev") > col("mad_c") * 3, 1L).otherwise(0L)).as("n_outliers"),
            count(lit(1)).as("n"))
          .orderBy(col("user_id"))
      },
      Some("""WITH ev AS (
              |  SELECT user_id, CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
              |  FROM events
              |), medw AS (
              |  SELECT user_id, v, COUNT(*) AS w FROM ev GROUP BY 1, 2
              |), medc AS (
              |  SELECT user_id, v,
              |         SUM(w) OVER (PARTITION BY user_id ORDER BY v
              |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
              |         SUM(w) OVER (PARTITION BY user_id) AS tw
              |  FROM medw
              |), med AS (
              |  SELECT user_id, MIN(v) AS med_c FROM medc WHERE cw * 2 >= tw GROUP BY 1
              |), dev AS (
              |  SELECT e.user_id, e.v, m.med_c, abs(e.v - m.med_c) AS dev
              |  FROM ev e JOIN med m ON e.user_id = m.user_id
              |), madw AS (
              |  SELECT user_id, dev AS v, COUNT(*) AS w FROM dev GROUP BY 1, 2
              |), madc AS (
              |  SELECT user_id, v,
              |         SUM(w) OVER (PARTITION BY user_id ORDER BY v
              |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
              |         SUM(w) OVER (PARTITION BY user_id) AS tw
              |  FROM madw
              |), mad AS (
              |  SELECT user_id, MIN(v) AS mad_c FROM madc WHERE cw * 2 >= tw GROUP BY 1
              |)
              |SELECT d.user_id,
              |       MIN(d.med_c) AS med_c,
              |       MIN(a.mad_c) AS mad_c,
              |       CAST(SUM(CASE WHEN d.dev > a.mad_c * 3 THEN 1 ELSE 0 END) AS BIGINT)
              |         AS n_outliers,
              |       CAST(COUNT(*) AS BIGINT) AS n
              |FROM dev d JOIN mad a ON d.user_id = a.user_id
              |GROUP BY d.user_id
              |ORDER BY d.user_id NULLS FIRST""".stripMargin)),

    // 2-D Pareto skyline (minimize price, maximize size) — the textbook
    // formulation is a quadratic NOT EXISTS self-join (kept as the
    // oracle); the engine plans it O(n log n): collapse ties to one row
    // per price (a hash agg), a running strictly-preceding max over the
    // price order, and a co-keyed join back. A part survives iff no part
    // with strictly lower price has a strictly larger size. Scale shape:
    // one agg shuffle on price, then `Partitioning.prefixMax` — the
    // TWO-PASS distributed running max (range-partition + pid-local
    // window + broadcast per-partition prefixes) — so NO data-sized
    // single-partition window exists anywhere in the plan (the only
    // serial window runs over numPartitions rows), then one shuffle join
    // back on price. Doubles: 2-dp prices group and compare exactly;
    // sizes are ints.
    "q_win_skyline" -> Q(
      t => {
        val parts = t.part.select(col("p_partkey"), col("p_retailprice"), col("p_size"))
        val perPrice = parts.groupBy(col("p_retailprice").as("price"))
          .agg(max(col("p_size")).as("gmax"))
        val withPrev = graft.operators.Partitioning
          .prefixMax(perPrice, "price", "gmax")
        parts.join(withPrev, col("p_retailprice") === col("price"))
          .filter(col("prev_max").isNull || col("prev_max") <= col("p_size"))
          .select(col("p_partkey"), col("p_retailprice"), col("p_size"))
          .orderBy(col("p_partkey"))
      },
      Some("""SELECT p_partkey, p_retailprice, p_size
              |FROM part x
              |WHERE NOT EXISTS (
              |  SELECT 1 FROM part y
              |  WHERE y.p_retailprice < x.p_retailprice
              |    AND y.p_size > x.p_size)
              |ORDER BY p_partkey NULLS FIRST""".stripMargin)),

    // Last-touch attribution — every purchase credits the user's most
    // recent strictly-preceding marketing touch (click/view; ties on ts
    // broken by event_id, so "preceding" is a total lexicographic order
    // and the result is engine-stable). The engine does it in ONE window
    // pass over the user's event stream: last(touch_type, ignoreNulls)
    // over rows UNBOUNDED PRECEDING..1 PRECEDING in (ts, event_id) order
    // — no self-join, no fan-out, constant memory per row. The oracle is
    // the classic formulation: purchases × touches per user, ROW_NUMBER
    // argmax — quadratic per user, which is exactly why the window form
    // is the one that survives 100 TB (cost = one sort per user
    // partition). Unattributed purchases surface as touch_type 'none'.
    // Revenue in exact integer cents (events.value is full-precision).
    "q_events_attribution" -> Q(
      t => {
        val touch = col("event_type").isin("click", "view")
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        t.events
          .select(col("event_id"), col("user_id"), col("ts"),
            col("event_type"), col("value"))
          .withColumn("last_touch",
            last(when(touch, col("event_type")), ignoreNulls = true).over(w))
          .filter(col("event_type") === "purchase")
          .groupBy(coalesce(col("last_touch"), lit("none")).as("touch_type"))
          .agg(count(lit(1)).as("n_purchases"),
            sum(cents(col("value")).cast("long")).as("revenue_cents"))
          .orderBy(col("touch_type"))
      },
      Some("""WITH purchases AS (
              |  SELECT event_id, user_id, ts, value FROM events
              |  WHERE event_type = 'purchase'
              |), touches AS (
              |  SELECT event_id, user_id, ts, event_type FROM events
              |  WHERE event_type IN ('click', 'view')
              |), attributed AS (
              |  SELECT p.event_id AS pid, p.value, t.event_type AS last_touch,
              |         ROW_NUMBER() OVER (PARTITION BY p.event_id
              |           ORDER BY t.ts DESC, t.event_id DESC) AS rn
              |  FROM purchases p
              |  JOIN touches t ON t.user_id = p.user_id
              |   AND (t.ts < p.ts OR (t.ts = p.ts AND t.event_id < p.event_id))
              |), best AS (
              |  SELECT pid, last_touch FROM attributed WHERE rn = 1
              |)
              |SELECT COALESCE(b.last_touch, 'none') AS touch_type,
              |       COUNT(*) AS n_purchases,
              |       CAST(SUM(CAST(floor(p.value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
              |FROM purchases p LEFT JOIN best b ON p.event_id = b.pid
              |GROUP BY 1
              |ORDER BY touch_type NULLS FIRST""".stripMargin)),

    // Linear (equal-credit) multi-touch attribution — last-touch's sibling
    // model: every strictly-preceding click/view of a purchase shares the
    // credit equally, so a purchase contributes cnt_type/total to each
    // type. The engine computes it with TWO running counters per user (one
    // window pass, same (ts, event_id) total order as every other anchor —
    // no touch×purchase fan-out), and the credit is exact integer math:
    // 10⁶·cnt_type div total micro-units (true integer division on both
    // engines — div here, // in the oracle), so the gate is float-free.
    // Touchless purchases credit 'none' with the full 10⁶. The oracle is
    // the quadratic formulation — purchases × preceding touches, grouped
    // per purchase — which is exactly the join the window pass avoids at
    // 100 TB; the gate proves the rewrite, not just the arithmetic.
    "q_events_attribution_linear" -> Q(
      t => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val credited = t.events
          // both counters in ONE projection → a single Window node sharing
          // one sort (AttributionPlanSpec pins it; sequential withColumns
          // would plan two Window nodes)
          .select(col("event_type"),
            count(when(col("event_type") === "click", lit(1))).over(w).as("n_click"),
            count(when(col("event_type") === "view", lit(1))).over(w).as("n_view"))
          .filter(col("event_type") === "purchase")
          .withColumn("total", col("n_click") + col("n_view"))
        credited.select(
          sum(when(col("total") > 0,
            expr("1000000 * n_click div total"))
            .otherwise(lit(0L))).as("click_credit_micro"),
          sum(when(col("total") > 0,
            expr("1000000 * n_view div total"))
            .otherwise(lit(0L))).as("view_credit_micro"),
          sum(when(col("total") === 0, lit(1000000L)).otherwise(lit(0L)))
            .as("none_credit_micro"),
          count(lit(1)).as("n_purchases"))
      },
      Some("""WITH purchases AS (
             |  SELECT event_id AS pid, user_id, ts FROM events
             |  WHERE event_type = 'purchase'
             |), touches AS (
             |  SELECT user_id, ts, event_id, event_type FROM events
             |  WHERE event_type IN ('click', 'view')
             |), per_purchase AS (
             |  SELECT p.pid,
             |         COUNT(CASE WHEN t.event_type = 'click' THEN 1 END) AS n_click,
             |         COUNT(CASE WHEN t.event_type = 'view' THEN 1 END) AS n_view
             |  FROM purchases p
             |  LEFT JOIN touches t ON t.user_id = p.user_id
             |   AND (t.ts < p.ts OR (t.ts = p.ts AND t.event_id < p.pid))
             |  GROUP BY p.pid
             |)
             |SELECT CAST(SUM(CASE WHEN n_click + n_view > 0
             |         THEN 1000000 * n_click // (n_click + n_view)
             |         ELSE 0 END) AS BIGINT) AS click_credit_micro,
             |       CAST(SUM(CASE WHEN n_click + n_view > 0
             |         THEN 1000000 * n_view // (n_click + n_view)
             |         ELSE 0 END) AS BIGINT) AS view_credit_micro,
             |       CAST(SUM(CASE WHEN n_click + n_view = 0
             |         THEN 1000000 ELSE 0 END) AS BIGINT) AS none_credit_micro,
             |       COUNT(*) AS n_purchases
             |FROM per_purchase""".stripMargin)),

    // Welch's t-statistic for an A/B split (variant = user_id parity) on
    // purchase values. Everything order-dependent is integral: per-variant
    // COUNT, SUM(cents), SUM(cents²) are exact int64 partial-agg'd sums
    // (cents ≤ 49k → cents² ≤ 2.4e9; the sum overflows int64 around 4e9
    // rows per variant — beyond that switch the sumsq leg to DECIMAL(38,0)).
    // The float math (means, Welch variance, sqrt, one divide) runs on
    // those exact integers in ONE fixed operation order, and IEEE
    // division/sqrt are correctly rounded on both engines — so the t-stat
    // is bit-stable without any tolerance. Scale shape: a 2-group
    // partial+final hash agg, then constant-size arithmetic.
    "q_events_ab_ttest" -> Q(
      t => {
        val grp = t.events
          .filter(col("event_type") === "purchase")
          .select((col("user_id") % 2).cast("int").as("variant"),
            cents(col("value")).cast("long").as("v"))
          .groupBy(col("variant"))
          .agg(count(lit(1)).as("n"), sum(col("v")).as("s"),
            sum(col("v") * col("v")).as("q"))
        val a = grp.filter(col("variant") === 0)
          .select(col("n").as("n_a"), col("s").as("s_a"), col("q").as("q_a"))
        val b = grp.filter(col("variant") === 1)
          .select(col("n").as("n_b"), col("s").as("s_b"), col("q").as("q_b"))
        val mA = col("s_a").cast("double") / col("n_a")
        val mB = col("s_b").cast("double") / col("n_b")
        val varA = (col("q_a").cast("double") - col("s_a").cast("double") * col("s_a") / col("n_a")) / (col("n_a") - 1)
        val varB = (col("q_b").cast("double") - col("s_b").cast("double") * col("s_b") / col("n_b")) / (col("n_b") - 1)
        a.crossJoin(b)
          .select(col("n_a"), col("n_b"),
            round((mA - mB) / 100.0, 4).as("mean_diff"),
            round((mA - mB) / sqrt(varA / col("n_a") + varB / col("n_b")), 6)
              .as("t_stat"))
      },
      Some("""WITH g AS (
              |  SELECT CAST(user_id % 2 AS INTEGER) AS variant,
              |         COUNT(*) AS n,
              |         SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS s,
              |         SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)
              |           * CAST(floor(value * 100 + 0.5) AS BIGINT)) AS q
              |  FROM events WHERE event_type = 'purchase'
              |  GROUP BY 1
              |), a AS (SELECT n AS n_a, s AS s_a, q AS q_a FROM g WHERE variant = 0),
              |   b AS (SELECT n AS n_b, s AS s_b, q AS q_b FROM g WHERE variant = 1)
              |SELECT n_a, n_b,
              |       ROUND((CAST(s_a AS DOUBLE) / n_a - CAST(s_b AS DOUBLE) / n_b) / 100.0, 4) AS mean_diff,
              |       ROUND((CAST(s_a AS DOUBLE) / n_a - CAST(s_b AS DOUBLE) / n_b)
              |         / sqrt((CAST(q_a AS DOUBLE) - CAST(s_a AS DOUBLE) * s_a / n_a) / (n_a - 1) / n_a
              |              + (CAST(q_b AS DOUBLE) - CAST(s_b AS DOUBLE) * s_b / n_b) / (n_b - 1) / n_b),
              |         6) AS t_stat
              |FROM a, b""".stripMargin)),

    // Simple OLS regression (purchase cents on hour-of-day) — the
    // regr_slope/regr_intercept/regr_r2 family, stated deterministically:
    // Spark's and DuckDB's built-in regr_* aggregates sum DOUBLES in
    // partial-merge order (run- and engine-unstable), so the anchor
    // instead partial-aggregates the SIX exact int64 moments (n, Σx, Σy,
    // Σxy, Σx², Σy²) — order-independent — and evaluates the closed-form
    // slope/intercept/r² from them in one fixed double op sequence.
    // Scale shape: a single 1-row partial+final agg; the moment sums are
    // the map-side work. Int64 headroom: Σy² ≤ 2.4e9·rows — overflows
    // past ~4e9 purchase rows per partition-merge tree; switch the y²
    // leg to DECIMAL(38,0) beyond that.
    "q_events_regression" -> Q(
      t => {
        val m = t.events
          .filter(col("event_type") === "purchase")
          .select(hour(col("ts")).cast("long").as("x"),
            cents(col("value")).cast("long").as("y"))
          .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
            sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
            sum(col("x") * col("x")).as("sxx"),
            sum(col("y") * col("y")).as("syy"))
        val n = col("n").cast("double")
        val cov = n * col("sxy") - col("sx").cast("double") * col("sy")
        val varX = n * col("sxx") - col("sx").cast("double") * col("sx")
        val varY = n * col("syy") - col("sy").cast("double") * col("sy")
        m.select(col("n"),
          round(cov / varX, 6).as("slope_cents_per_hour"),
          round((col("sy").cast("double") - cov / varX * col("sx")) / n / 100.0, 4)
            .as("intercept"),
          round(cov * cov / (varX * varY), 6).as("r2"))
      },
      Some("""WITH m AS (
              |  SELECT COUNT(*) AS n,
              |         SUM(CAST(hour(ts) AS BIGINT)) AS sx,
              |         SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS sy,
              |         SUM(CAST(hour(ts) AS BIGINT)
              |           * CAST(floor(value * 100 + 0.5) AS BIGINT)) AS sxy,
              |         SUM(CAST(hour(ts) AS BIGINT) * CAST(hour(ts) AS BIGINT)) AS sxx,
              |         SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)
              |           * CAST(floor(value * 100 + 0.5) AS BIGINT)) AS syy
              |  FROM events WHERE event_type = 'purchase'
              |)
              |SELECT n,
              |       ROUND((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
              |         / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx), 6) AS slope_cents_per_hour,
              |       ROUND((CAST(sy AS DOUBLE)
              |         - (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
              |           / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) * sx)
              |         / CAST(n AS DOUBLE) / 100.0, 4) AS intercept,
              |       ROUND((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
              |         * (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
              |         / ((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
              |          * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)), 6) AS r2
              |FROM m""".stripMargin)),

    // OHLC downsampling — the market-data resample shape: per (user, day)
    // bar with open/close = value at the first/last event and high/low =
    // extremes. First/last are argmin/argmax over the SAME total
    // (ts, event_id) order every other anchor uses — min_by/max_by on a
    // composite struct key, so ties cannot differ between engines; the
    // oracle replays them as rank-1 window picks, a different formulation
    // of the same selection. All outputs exact cents. Scale shape: ONE
    // partial+final hash agg on the bar key — min_by/max_by partial-merge
    // like any algebraic aggregate, so no window, no sort, no second pass
    // over the fact.
    "q_ts_ohlc" -> Q(
      t => {
        val key = struct(col("ts"), col("event_id"))
        t.events
          .filter(col("event_type") === "purchase")
          .select(col("user_id"), to_date(col("ts")).as("day"),
            col("ts"), col("event_id"), cents(col("value")).cast("long").as("v"))
          .groupBy(col("user_id"), col("day"))
          .agg(min_by(col("v"), key).as("open_cents"),
            max(col("v")).as("high_cents"),
            min(col("v")).as("low_cents"),
            max_by(col("v"), key).as("close_cents"),
            count(lit(1)).as("n_trades"),
            sum(col("v")).as("volume_cents"))
          .select(col("user_id"), date_format(col("day"), "yyyy-MM-dd").as("day"),
            col("open_cents"), col("high_cents"), col("low_cents"),
            col("close_cents"), col("n_trades"), col("volume_cents"))
          .orderBy(col("user_id"), col("day"))
      },
      Some("""WITH p AS (
              |  SELECT user_id, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
              |         CAST(floor(value * 100 + 0.5) AS BIGINT) AS v,
              |         ROW_NUMBER() OVER (PARTITION BY user_id, CAST(ts AS DATE)
              |           ORDER BY ts, event_id) AS rn_a,
              |         ROW_NUMBER() OVER (PARTITION BY user_id, CAST(ts AS DATE)
              |           ORDER BY ts DESC, event_id DESC) AS rn_d
              |  FROM events WHERE event_type = 'purchase'
              |)
              |SELECT user_id, day,
              |       MAX(CASE WHEN rn_a = 1 THEN v END) AS open_cents,
              |       MAX(v) AS high_cents,
              |       MIN(v) AS low_cents,
              |       MAX(CASE WHEN rn_d = 1 THEN v END) AS close_cents,
              |       COUNT(*) AS n_trades,
              |       CAST(SUM(v) AS BIGINT) AS volume_cents
              |FROM p
              |GROUP BY 1, 2
              |ORDER BY user_id NULLS FIRST, day NULLS FIRST""".stripMargin)))
}
