package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pivot and statistical aggregates — the remaining common OLAP surface. */
object Analytics extends Catalog {

  def queries: Map[String, Q] = Map(
    // Equi-width histogram anchored on the GLOBAL min/max (the feature-
    // stats primitive behind outlier gates and quantization ranges):
    // 16 bins over l_extendedprice, everything in exact cent BIGINTs —
    // bucket = (cents − min) · 16 div (max − min + 1), clamp-free because
    // the +1 denominator keeps the max inside bin 15. The one-row min/max
    // aggregate reduces map-side and rejoins as a broadcast cross join
    // (same shape as q_join_dormant_rich's scalar gate), so the histogram
    // costs one fact scan + one 16-row shuffle at any corpus size.
    "q_agg_histogram" -> Q(
      t => {
        val cents = t.lineitem.select(
          floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("c"))
        val mm = cents.agg(min(col("c")).as("lo"), max(col("c")).as("hi"))
        cents.crossJoin(broadcast(mm))
          .select(expr("(c - lo) * 16 div (hi - lo + 1)").as("bucket"), col("c"))
          .groupBy(col("bucket"))
          .agg(count(lit(1)).as("n"), sum(col("c")).as("sum_cents"),
            min(col("c")).as("min_cents"), max(col("c")).as("max_cents"))
          .orderBy(col("bucket"))
      },
      Some("""WITH cents AS (
              |  SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS c
              |  FROM lineitem
              |), mm AS (
              |  SELECT MIN(c) AS lo, MAX(c) AS hi FROM cents
              |)
              |SELECT ((c - lo) * 16 // (hi - lo + 1)) AS bucket,
              |       CAST(COUNT(*) AS BIGINT) AS n,
              |       CAST(SUM(c) AS BIGINT) AS sum_cents,
              |       MIN(c) AS min_cents, MAX(c) AS max_cents
              |FROM cents CROSS JOIN mm
              |GROUP BY 1
              |ORDER BY bucket NULLS FIRST""".stripMargin)),

    // pivot: rows → columns on a low-cardinality key (values enumerated
    // explicitly, as any scale-safe pivot must be)
    "q_agg_pivot" -> Q(
      t => t.lineitem
        .groupBy(col("l_returnflag"))
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(round(sum(col("l_quantity")), 2))
        .withColumnRenamed("F", "qty_f")
        .withColumnRenamed("O", "qty_o")
        .orderBy(col("l_returnflag"), col("qty_f"), col("qty_o")),
      Some("""SELECT l_returnflag,
                     ROUND(SUM(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS qty_f,
                     ROUND(SUM(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS qty_o
              FROM lineitem
              GROUP BY l_returnflag
              ORDER BY l_returnflag NULLS FIRST, qty_f NULLS FIRST, qty_o NULLS FIRST""")),

    // Statistical aggregates from EXACT integer moments, not the built-in
    // double aggregates: stddev/var/corr/covar partial-merge order is
    // nondeterministic (task completion order), so their double partials can
    // flip the last bit run-to-run — the same failure class as the
    // q_win_sessionize hash bug. Here both engines sum exact integer cents
    // moments (decimal/HUGEINT: associative, order-independent, no overflow
    // at any SF) and then evaluate the SAME fixed sequence of IEEE 754
    // double ops — bit-identical across runs, engines, and parallelism.
    "q_agg_statistical" -> Q(
      t => {
        val qc = cents(col("l_quantity"))       // BIGINT cents, exact
        val pc = cents(col("l_extendedprice"))
        val m = t.lineitem
          .groupBy(col("l_returnflag"))
          .agg(
            count(lit(1)).as("cnt"),
            sum(qc.cast("decimal(38,0)")).as("sq"),
            sum(pc.cast("decimal(38,0)")).as("sp"),
            sum((qc * qc).cast("decimal(38,0)")).as("sqq"),
            sum((pc * pc).cast("decimal(38,0)")).as("spp"),
            sum((qc * pc).cast("decimal(38,0)")).as("sqp"),
            expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY l_extendedprice)").as("med"))
        val n = col("cnt").cast("double")
        val sq = col("sq").cast("double"); val sp = col("sp").cast("double")
        val sqq = col("sqq").cast("double"); val spp = col("spp").cast("double")
        val sqp = col("sqp").cast("double")
        // n·variance numerators in cents² — written once, reused verbatim
        // in the SQL twin so the IEEE op sequence matches exactly
        val mqq = sqq - sq * sq / n
        val mpp = spp - sp * sp / n
        val mqp = sqp - sq * sp / n
        m.select(
          col("l_returnflag"),
          round(sqrt(mpp / (n - 1)) / 100.0, 2).as("sd_price"),
          round(sqrt(mpp / n) / 100.0, 2).as("sdp_price"),
          round(mqq / (n - 1) / 10000.0, 2).as("var_qty"),
          round(mqq / n / 10000.0, 2).as("varp_qty"),
          round(mqp / sqrt(mqq * mpp), 4).as("corr_qp"),
          round(mqp / (n - 1) / 10000.0, 2).as("cov_qp"),
          round(col("med"), 2).as("median_price"))
          .orderBy(col("l_returnflag"), col("sd_price"), col("sdp_price"), col("var_qty"),
            col("varp_qty"), col("corr_qp"), col("cov_qp"), col("median_price"))
      },
      Some("""WITH c AS (
              |  SELECT l_returnflag, l_extendedprice,
              |         CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS qc,
              |         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS pc
              |  FROM lineitem
              |), m AS (
              |  SELECT l_returnflag,
              |         CAST(COUNT(*) AS DOUBLE) AS n,
              |         CAST(SUM(qc) AS DOUBLE) AS sq,
              |         CAST(SUM(pc) AS DOUBLE) AS sp,
              |         CAST(SUM(qc * qc) AS DOUBLE) AS sqq,
              |         CAST(SUM(pc * pc) AS DOUBLE) AS spp,
              |         CAST(SUM(qc * pc) AS DOUBLE) AS sqp,
              |         quantile_cont(l_extendedprice, 0.5) AS med
              |  FROM c GROUP BY l_returnflag
              |)
              |SELECT l_returnflag,
              |       ROUND(sqrt((spp - sp * sp / n) / (n - 1)) / 100.0, 2) AS sd_price,
              |       ROUND(sqrt((spp - sp * sp / n) / n) / 100.0, 2) AS sdp_price,
              |       ROUND((sqq - sq * sq / n) / (n - 1) / 10000.0, 2) AS var_qty,
              |       ROUND((sqq - sq * sq / n) / n / 10000.0, 2) AS varp_qty,
              |       ROUND((sqp - sq * sp / n) / sqrt((sqq - sq * sq / n) * (spp - sp * sp / n)), 4) AS corr_qp,
              |       ROUND((sqp - sq * sp / n) / (n - 1) / 10000.0, 2) AS cov_qp,
              |       ROUND(med, 2) AS median_price
              |FROM m
              |ORDER BY l_returnflag NULLS FIRST, sd_price NULLS FIRST, sdp_price NULLS FIRST,
              |         var_qty NULLS FIRST, varp_qty NULLS FIRST, corr_qp NULLS FIRST,
              |         cov_qp NULLS FIRST, median_price NULLS FIRST""".stripMargin)),

    // Exact interpolated quantiles (percentile_cont semantics on both
    // engines). l_quantity is integer-valued, so every quartile is an exact
    // dyadic double (x.0/.25/.5/.75) — no cross-engine interpolation
    // rounding to paper over. Exact percentile is a per-group sort, which
    // is fine per-group at any corpus size (groups partition the data);
    // the streaming/sketch path for single-pass approximation is
    // percentile_approx, tolerance-tested in ApproxSpec.
    "q_agg_percentiles" -> Q(
      t => t.lineitem
        .groupBy(col("l_returnflag"))
        .agg(
          expr("percentile_cont(0.25) WITHIN GROUP (ORDER BY l_quantity)").as("p25"),
          expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY l_quantity)").as("p50"),
          expr("percentile_cont(0.75) WITHIN GROUP (ORDER BY l_quantity)").as("p75"),
          min(col("l_quantity")).as("qmin"),
          max(col("l_quantity")).as("qmax"))
        .orderBy(col("l_returnflag"), col("p25"), col("p50"), col("p75"),
          col("qmin"), col("qmax")),
      Some("""SELECT l_returnflag,
                     quantile_cont(l_quantity, 0.25) AS p25,
                     quantile_cont(l_quantity, 0.5) AS p50,
                     quantile_cont(l_quantity, 0.75) AS p75,
                     MIN(l_quantity) AS qmin,
                     MAX(l_quantity) AS qmax
              FROM lineitem
              GROUP BY l_returnflag
              ORDER BY l_returnflag NULLS FIRST, p25 NULLS FIRST, p50 NULLS FIRST,
                       p75 NULLS FIRST, qmin NULLS FIRST, qmax NULLS FIRST""")),

    // Unpivot/melt — the inverse of q_agg_pivot, via the dedicated
    // Dataset.unpivot operator (wide metric columns → long (metric, value)
    // rows). Aggregated with the exact cents-as-long money sum so the
    // per-metric totals are order-independent; the oracle states the melt
    // as the equivalent UNION ALL.
    "q_agg_unpivot" -> Q(
      t => t.lineitem
        .unpivot(
          Array(col("l_orderkey")),
          Array(col("l_quantity"), col("l_extendedprice"), col("l_discount"), col("l_tax")),
          "metric", "value")
        .groupBy(col("metric"))
        .agg(count(lit(1)).as("n"), round(msum(col("value")), 2).as("total"))
        .orderBy(col("metric"), col("n"), col("total")),
      Some("""WITH m AS (
              |  SELECT 'l_quantity' AS metric, l_quantity AS value FROM lineitem
              |  UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem
              |  UNION ALL SELECT 'l_discount', l_discount FROM lineitem
              |  UNION ALL SELECT 'l_tax', l_tax FROM lineitem
              |)
              |SELECT metric, COUNT(*) AS n,
              |       ROUND(CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0, 2) AS total
              |FROM m GROUP BY metric
              |ORDER BY metric NULLS FIRST, n NULLS FIRST, total NULLS FIRST""".stripMargin)),

    // Time-series gap fill with LOCF — per-user daily grid spanning each
    // user's observed range (sequence + explode generates the missing
    // days), left-joined to the observed daily aggregate, nulls filled by
    // last-observation-carried-forward (last(ignoreNulls) over a running
    // frame). MAX is the daily aggregate because max of doubles is
    // order-independent (a float SUM would not hash-match). Scale shape:
    // the daily rollup, the grid join, and the LOCF window all key on
    // user_id (+day), so the plan is one agg shuffle + one co-keyed join +
    // an in-partition window — grid size is bounded by span, not events.
    "q_ts_gapfill" -> Q(
      t => {
        val daily = t.events
          .groupBy(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"))
          .agg(max(col("value")).as("v"))
        val grid = daily.groupBy(col("user_id"))
          .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
          .select(col("user_id"), explode(sequence(col("d0"), col("d1"))).as("day"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("day"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow)
        grid.join(daily, Seq("user_id", "day"), "left")
          .select(col("user_id"), col("day"), round(col("v"), 4).as("v"),
            round(last(col("v"), ignoreNulls = true).over(w), 4).as("v_filled"))
          .orderBy(col("user_id"), col("day"), col("v"), col("v_filled"))
      },
      Some("""WITH daily AS (
              |  SELECT user_id,
              |         epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
              |         MAX(value) AS v
              |  FROM events GROUP BY 1, 2
              |), spans AS (
              |  SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY 1
              |), grid AS (
              |  SELECT user_id, unnest(range(d0, d1 + 1)) AS day FROM spans
              |)
              |SELECT g.user_id, g.day, ROUND(d.v, 4) AS v,
              |       ROUND(last_value(d.v IGNORE NULLS) OVER (
              |         PARTITION BY g.user_id ORDER BY g.day
              |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS v_filled
              |FROM grid g LEFT JOIN daily d USING (user_id, day)
              |ORDER BY user_id NULLS FIRST, day NULLS FIRST, v NULLS FIRST,
              |         v_filled NULLS FIRST""".stripMargin)),

    // Trailing-window distinct users — the DAU/WAU/stickiness rollup, and
    // the canonical COUNT(DISTINCT) over a SLIDING window problem: a user
    // active twice in one 7-day window must count once, so no windowed
    // running aggregate applies (distinct doesn't decompose over frames).
    // The scale-correct plan: collapse to distinct (user, day) once — the
    // only corpus-sized shuffle, map-side combined — then each active day
    // COVERS its next 7 calendar days via a 7× narrow explode, distinct
    // (user, covered-day) collapses multi-active users per window, and a
    // count per day finishes. Cost is 7·|user-days|, independent of raw
    // event volume — the window length, not the corpus, is the fan-out.
    // Stickiness (DAU/WAU) lands as ONE integer micro-unit division.
    // Days with no activity are absent by construction (inner join).
    "q_events_wau" -> Q(
      t => {
        val ud = t.events
          .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"))
          .distinct()
          .localCheckpoint(true)
        val dau = ud.groupBy(col("day")).agg(count(lit(1)).as("n_dau"))
        val wau = ud
          .select(col("user_id"), explode(sequence(col("day"), col("day") + 6)).as("target"))
          .distinct()
          .groupBy(col("target")).agg(count(lit(1)).as("n_wau"))
        dau.join(wau, col("day") === col("target"))
          .select(col("day"), col("n_dau"), col("n_wau"),
            expr("n_dau * 1000000 div n_wau").as("stickiness_u"))
          .orderBy(col("day"))
      },
      Some("""WITH ud AS (
              |  SELECT DISTINCT user_id,
              |         epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day
              |  FROM events
              |), dau AS (
              |  SELECT day, CAST(COUNT(*) AS BIGINT) AS n_dau FROM ud GROUP BY 1
              |), cover AS (
              |  SELECT DISTINCT user_id, day + r AS target
              |  FROM ud CROSS JOIN (SELECT unnest(range(0, 7)) AS r)
              |), wau AS (
              |  SELECT target, CAST(COUNT(*) AS BIGINT) AS n_wau
              |  FROM cover GROUP BY 1
              |)
              |SELECT d.day, d.n_dau, w.n_wau,
              |       (d.n_dau * 1000000 // w.n_wau) AS stickiness_u
              |FROM dau d JOIN wau w ON d.day = w.target
              |ORDER BY d.day NULLS FIRST""".stripMargin)),

    // Incremental aggregation (incremental view maintenance / the lambda
    // compaction): yesterday's per-user aggregate STATE merged with
    // today's raw INCREMENT must equal the full recompute — the contract
    // that lets a 100 TB rollup absorb a daily slice without rescanning
    // history. The state and increment here are the two time halves of
    // the stream, each aggregated to (n, Σ, max) partials; the merge is a
    // keyed FULL OUTER join with null-absorbing combination (0 for
    // additive partials, null-skipping greatest for max — exactly the
    // partial-merge algebra Spark's own ObjectHashAggregate runs
    // internally, lifted to the query level). The oracle is the one-shot
    // aggregate over everything: the gate proves merge-of-partials ≡
    // recompute. In production the state side is a materialized table —
    // the increment join touches O(users), never the history.
    "q_agg_incremental" -> Q(
      t => {
        val ev = t.events.select(col("user_id"), expr("unix_micros(ts)").as("us"),
          cents(col("value")).cast("long").as("c"))
        val mm = ev.agg(min(col("us")).as("t0"), max(col("us")).as("t1"))
        val tagged = ev.crossJoin(broadcast(mm))
        def partial(df: org.apache.spark.sql.DataFrame) =
          df.groupBy(col("user_id"))
            .agg(count(lit(1)).as("n"), sum(col("c")).as("s"), max(col("c")).as("m"))
        val state = partial(tagged.filter(col("us") * 2 <= col("t0") + col("t1")))
        val incr = partial(tagged.filter(col("us") * 2 > col("t0") + col("t1")))
        state.select(col("user_id"), col("n").as("n1"), col("s").as("s1"), col("m").as("m1"))
          .join(incr.select(col("user_id"), col("n").as("n2"),
            col("s").as("s2"), col("m").as("m2")), Seq("user_id"), "full_outer")
          .select(col("user_id"),
            (coalesce(col("n1"), lit(0L)) + coalesce(col("n2"), lit(0L))).as("n_events"),
            (coalesce(col("s1"), lit(0L)) + coalesce(col("s2"), lit(0L))).as("sum_cents"),
            greatest(col("m1"), col("m2")).as("max_cents"))
          .orderBy(col("user_id"))
      },
      Some("""SELECT user_id,
              |       CAST(COUNT(*) AS BIGINT) AS n_events,
              |       CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
              |         AS sum_cents,
              |       MAX(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS max_cents
              |FROM events
              |GROUP BY user_id
              |ORDER BY user_id NULLS FIRST""".stripMargin)),

    // Time-series gap fill by LINEAR INTERPOLATION — the continuous sibling
    // of q_ts_gapfill's LOCF: a missing day between two observed days gets
    // the straight-line value between them, in EXACT integer cents. The
    // division is written as an explicit FLOOR division on the Spark side
    // ((num − pmod(num, den)) div den, exact for the always-positive
    // den = nd − pd) so it matches DuckDB's flooring `//` for ANY sign of
    // the numerator — Spark's bare `div` truncates toward zero and would
    // silently diverge by 1 on a negative value (negative cents), a
    // data-dependent assumption this form removes rather than fences
    // (r9 advice #2). Edges of the grid (no neighbor on one side) stay
    // null. Scale
    // shape identical to gapfill: one events shuffle into the per-day
    // rollup, a co-keyed grid join, and BOTH direction windows (backward
    // last + forward first, each over value and day) share the one
    // (user_id; day) sort — no extra exchange for the second direction.
    "q_ts_interpolate" -> Q(
      t => {
        val W = org.apache.spark.sql.expressions.Window
        val daily = t.events
          .groupBy(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"))
          .agg(max(cents(col("value")).cast("long")).as("v_c"))
        val grid = daily.groupBy(col("user_id"))
          .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
          .select(col("user_id"), explode(sequence(col("d0"), col("d1"))).as("day"))
        val back = W.partitionBy(col("user_id")).orderBy(col("day"))
          .rowsBetween(W.unboundedPreceding, W.currentRow)
        val fwd = W.partitionBy(col("user_id")).orderBy(col("day"))
          .rowsBetween(W.currentRow, W.unboundedFollowing)
        val known = grid.join(daily, Seq("user_id", "day"), "left")
          .select(col("user_id"), col("day"), col("v_c"),
            last(col("v_c"), ignoreNulls = true).over(back).as("pv"),
            last(when(col("v_c").isNotNull, col("day")), ignoreNulls = true)
              .over(back).as("pd"),
            first(col("v_c"), ignoreNulls = true).over(fwd).as("nv"),
            first(when(col("v_c").isNotNull, col("day")), ignoreNulls = true)
              .over(fwd).as("nd"))
        known
          .withColumn("num",
            col("pv") * (col("nd") - col("day")) + col("nv") * (col("day") - col("pd")))
          .withColumn("den", col("nd") - col("pd"))
          .select(col("user_id"), col("day"), col("v_c"),
            when(col("v_c").isNotNull, col("v_c"))
              .when(col("pv").isNotNull && col("nv").isNotNull,
                // floor division for positive den: subtract the
                // non-negative pmod remainder, then the div is exact
                expr("(num - pmod(num, den)) div den"))
              .as("interp_c"))
          .orderBy(col("user_id"), col("day"), col("v_c"), col("interp_c"))
      },
      Some("""WITH daily AS (
              |  SELECT user_id,
              |         epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
              |         MAX(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS v_c
              |  FROM events GROUP BY 1, 2
              |), spans AS (
              |  SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY 1
              |), grid AS (
              |  SELECT user_id, unnest(range(d0, d1 + 1)) AS day FROM spans
              |), known AS (
              |  SELECT g.user_id, g.day, d.v_c,
              |         last_value(d.v_c IGNORE NULLS) OVER (
              |           PARTITION BY g.user_id ORDER BY g.day
              |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
              |         last_value(CASE WHEN d.v_c IS NOT NULL THEN g.day END IGNORE NULLS)
              |           OVER (PARTITION BY g.user_id ORDER BY g.day
              |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
              |         first_value(d.v_c IGNORE NULLS) OVER (
              |           PARTITION BY g.user_id ORDER BY g.day
              |           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
              |         first_value(CASE WHEN d.v_c IS NOT NULL THEN g.day END IGNORE NULLS)
              |           OVER (PARTITION BY g.user_id ORDER BY g.day
              |           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
              |  FROM grid g LEFT JOIN daily d USING (user_id, day)
              |)
              |SELECT user_id, day, v_c,
              |       CASE WHEN v_c IS NOT NULL THEN v_c
              |            WHEN pv IS NOT NULL AND nv IS NOT NULL
              |            THEN (pv * (nd - day) + nv * (day - pd)) // (nd - pd)
              |       END AS interp_c
              |FROM known
              |ORDER BY user_id NULLS FIRST, day NULLS FIRST, v_c NULLS FIRST,
              |         interp_c NULLS FIRST""".stripMargin)),

    // Weekly cohort retention — users bucketed by first-activity week,
    // counted per (cohort, weeks-since). Week index is exact int64 division
    // of epoch-µs (`div` / `//`), never float math on timestamps. Scale
    // shape: distinct (user, week) collapses the raw stream map-side
    // (partial agg) in one shuffle, the cohort min is an in-partition
    // window after a shuffle on user, and the final rollup groups a
    // relation already shrunk to ~|users|×|weeks|.
    "q_events_cohort_retention" -> Q(
      t => {
        val uw = t.events.select(col("user_id"),
          expr("unix_micros(ts) div 604800000000").as("wk")).distinct()
        val w = org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))
        uw.withColumn("cohort_wk", min(col("wk")).over(w))
          .groupBy(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("weeks_since"))
          .agg(count(lit(1)).as("n_users"))
          .orderBy(col("cohort_wk"), col("weeks_since"), col("n_users"))
      },
      Some("""WITH uw AS (
              |  SELECT DISTINCT user_id,
              |         epoch_us(CAST(ts AS TIMESTAMP)) // 604800000000 AS wk
              |  FROM events
              |), c AS (
              |  SELECT user_id, wk, MIN(wk) OVER (PARTITION BY user_id) AS cohort_wk
              |  FROM uw
              |)
              |SELECT cohort_wk, wk - cohort_wk AS weeks_since, COUNT(*) AS n_users
              |FROM c GROUP BY 1, 2
              |ORDER BY cohort_wk NULLS FIRST, weeks_since NULLS FIRST,
              |         n_users NULLS FIRST""".stripMargin)),

    // Ordered conversion funnel signup → view → purchase, each step within
    // 3 days of the previous one: users counted by deepest step reached.
    // Single-pass AND constant-memory-per-user (r8 verdict task 2 — the r7
    // collect_list form was single-shuffle but buffered every view/purchase
    // timestamp of a user in one aggregation buffer, so a hot key with
    // millions of events blows task memory at corpus scale): ONE
    // groupBy(user_id) with SORTED group iteration (flatMapSortedGroups =
    // exchange on user_id + in-partition spillable sort, no group
    // materialization), then a streaming scan per user. Sorted-by-ts order
    // makes "first qualifying event" ≡ "min qualifying event", so the scan
    // carries just three µs timestamps of state regardless of per-user
    // cardinality, and it short-circuits once the funnel completes.
    // K-independent: deeper funnels add state variables, never another
    // shuffle. Timestamp comparisons and the 3-day shift are exact integer
    // µs arithmetic on both engines; strict > lower bounds and inclusive
    // upper bounds replay the oracle's chained-MIN(CASE) semantics
    // (FunnelPlanSpec pins the edges and the hot-key behavior).
    "q_events_funnel" -> Q(
      t => {
        import t.spark.implicits._
        val w3d = 259200000000L // 3 days in µs
        val ev = t.events.select(col("user_id"),
          when(col("event_type") === "signup", 1)
            .when(col("event_type") === "view", 2)
            .when(col("event_type") === "purchase", 3)
            .otherwise(0).as("step"),
          unix_micros(col("ts")).as("us"))
        ev.groupBy(col("user_id")).as[Long, (Long, Int, Long)]
          .flatMapSortedGroups(col("us")) { (_, rows) =>
            var t1 = 0L; var t2 = 0L
            var has1 = false; var has2 = false; var has3 = false
            while (rows.hasNext && !has3) {
              val (_, step, us) = rows.next()
              if (step == 1 && !has1) { t1 = us; has1 = true }
              else if (step == 2 && has1 && !has2 && us > t1 && us <= t1 + w3d) { t2 = us; has2 = true }
              else if (step == 3 && has2 && us > t2 && us <= t2 + w3d) has3 = true
            }
            Iterator.single(if (has3) 3 else if (has2) 2 else if (has1) 1 else 0)
          }
          .toDF("depth")
          .groupBy(col("depth"))
          .agg(count(lit(1)).as("n_users"))
          .orderBy(col("depth"), col("n_users"))
      },
      Some("""WITH s1 AS (
              |  SELECT user_id,
              |         MIN(CASE WHEN event_type = 'signup' THEN CAST(ts AS TIMESTAMP) END) AS t1
              |  FROM events GROUP BY 1
              |), s2 AS (
              |  SELECT e.user_id,
              |         MIN(CASE WHEN e.event_type = 'view'
              |                   AND CAST(e.ts AS TIMESTAMP) > s1.t1
              |                   AND CAST(e.ts AS TIMESTAMP) <= s1.t1 + INTERVAL 3 DAY
              |                  THEN CAST(e.ts AS TIMESTAMP) END) AS t2,
              |         ANY_VALUE(s1.t1) AS t1
              |  FROM events e JOIN s1 ON e.user_id = s1.user_id GROUP BY 1
              |), s3 AS (
              |  SELECT e.user_id,
              |         MIN(CASE WHEN e.event_type = 'purchase'
              |                   AND CAST(e.ts AS TIMESTAMP) > s2.t2
              |                   AND CAST(e.ts AS TIMESTAMP) <= s2.t2 + INTERVAL 3 DAY
              |                  THEN CAST(e.ts AS TIMESTAMP) END) AS t3,
              |         ANY_VALUE(s2.t2) AS t2, ANY_VALUE(s2.t1) AS t1
              |  FROM events e JOIN s2 ON e.user_id = s2.user_id GROUP BY 1
              |)
              |SELECT CASE WHEN t3 IS NOT NULL THEN 3
              |            WHEN t2 IS NOT NULL THEN 2
              |            WHEN t1 IS NOT NULL THEN 1
              |            ELSE 0 END AS depth,
              |       COUNT(*) AS n_users
              |FROM s3 GROUP BY 1
              |ORDER BY depth NULLS FIRST, n_users NULLS FIRST""".stripMargin)),

    // First-order Markov transition matrix over per-user event sequences —
    // the behavioral sequence-model primitive (session modeling, anomaly
    // scoring, next-event prediction features). lag() over one (user_id;
    // ts, event_id) exchange derives transitions in-partition; the
    // transition matrix itself is |types|² ≈ 25 rows, so the per-prev
    // normalizing window costs nothing. Probabilities leave as exact
    // floor'd micro-units (BIGINT), immune to float division divergence.
    // At 100 TB: one fact shuffle for the lag, then a partial-agg'd
    // count shuffle of 25 keys — nothing else grows with the data.
    // Path / sequence mining — the 3-step generalization of q_events_markov's
    // single-step transition matrix: count every CONSECUTIVE 3-gram of
    // event types along each user's timeline (two stacked lags over ONE
    // window sort — no self-joins, no per-user collect), rank the paths.
    // The n-gram-over-a-partitioned-sequence shape is the behavioral twin
    // of the text bigram/BPE pair counts: one user_id exchange, one
    // in-partition sort shared by both lag frames, then a low-cardinality
    // (≤ |types|³) count aggregate that collapses map-side. Top-k with
    // full deterministic tie-break.
    "q_events_paths" -> Q(
      t => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        t.events
          .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
          .withColumn("e2", lag(col("event_type"), 1).over(w))
          .withColumn("e1", lag(col("event_type"), 2).over(w))
          .filter(col("e1").isNotNull)
          .groupBy(col("e1"), col("e2"), col("event_type").as("e3"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc_nulls_last, col("e1"), col("e2"), col("e3"))
          .limit(25)
      },
      Some("""WITH seq AS (
              |  SELECT event_type AS e3,
              |         lag(event_type, 1) OVER (PARTITION BY user_id
              |             ORDER BY CAST(ts AS TIMESTAMP), event_id) AS e2,
              |         lag(event_type, 2) OVER (PARTITION BY user_id
              |             ORDER BY CAST(ts AS TIMESTAMP), event_id) AS e1
              |  FROM events
              |)
              |SELECT e1, e2, e3, CAST(COUNT(*) AS BIGINT) AS n
              |FROM seq WHERE e1 IS NOT NULL
              |GROUP BY 1, 2, 3
              |ORDER BY n DESC NULLS LAST, e1, e2, e3
              |LIMIT 25""".stripMargin)),

    // Weighted median — the robust location statistic percentile_cont
    // can't express (each value carries a weight; the median is the
    // smallest value whose cumulative weight reaches half the total).
    // The crossing test cw·2 ≥ tw is pure BIGINT — no division, no .5
    // quantile boundary. Scale shape: collapse to one row per (group,
    // value) FIRST (map-side combined — the only corpus-sized step),
    // then both the running and the partition-total weight sums ride one
    // (group) exchange + one in-partition sort over the collapsed
    // per-value relation; the crossing filter + min finishes per group.
    "q_agg_weighted_median" -> Q(
      t => {
        val byVal = t.lineitem
          .select(col("l_returnflag"),
            cents(col("l_extendedprice")).cast("long").as("c"),
            col("l_quantity").cast("long").as("wt"))
          .groupBy(col("l_returnflag"), col("c"))
          .agg(sum(col("wt")).as("w"))
        val cum = Window.partitionBy(col("l_returnflag")).orderBy(col("c"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val all = Window.partitionBy(col("l_returnflag"))
        byVal
          .select(col("l_returnflag"), col("c"),
            sum(col("w")).over(cum).as("cw"),
            sum(col("w")).over(all).as("tw"))
          .filter(col("cw") * 2 >= col("tw"))
          .groupBy(col("l_returnflag"))
          .agg(min(col("c")).as("wmedian_cents"), max(col("tw")).as("total_weight"))
          .orderBy(col("l_returnflag"))
      },
      Some("""WITH bv AS (
              |  SELECT l_returnflag,
              |         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS c,
              |         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
              |  FROM lineitem GROUP BY 1, 2
              |), cum AS (
              |  SELECT l_returnflag, c,
              |         CAST(SUM(w) OVER (PARTITION BY l_returnflag ORDER BY c
              |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cw,
              |         CAST(SUM(w) OVER (PARTITION BY l_returnflag) AS BIGINT) AS tw
              |  FROM bv
              |)
              |SELECT l_returnflag, MIN(c) AS wmedian_cents, MAX(tw) AS total_weight
              |FROM cum WHERE cw * 2 >= tw
              |GROUP BY 1
              |ORDER BY l_returnflag NULLS FIRST""".stripMargin)),

    "q_events_markov" -> Q(
      t => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val trans = t.events
          .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
          .withColumn("prev_type", lag(col("event_type"), 1).over(w))
          .filter(col("prev_type").isNotNull)
          .groupBy(col("prev_type"), col("event_type").as("next_type"))
          .agg(count(lit(1)).as("n"))
        trans
          .withColumn("p_micro",
            expr("n * 1000000L div sum(n) OVER (PARTITION BY prev_type)"))
          .select(col("prev_type"), col("next_type"), col("n"), col("p_micro"))
          .orderBy(col("prev_type"), col("next_type"), col("n"), col("p_micro"))
      },
      Some("""WITH seq AS (
              |  SELECT user_id, event_type,
              |         lag(event_type, 1) OVER (PARTITION BY user_id
              |             ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev_type
              |  FROM events
              |), trans AS (
              |  SELECT prev_type, event_type AS next_type, COUNT(*) AS n
              |  FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2
              |)
              |SELECT prev_type, next_type, n,
              |       CAST(n * 1000000 // sum(n) OVER (PARTITION BY prev_type) AS BIGINT) AS p_micro
              |FROM trans
              |ORDER BY prev_type NULLS FIRST, next_type NULLS FIRST,
              |         n NULLS FIRST, p_micro NULLS FIRST""".stripMargin)),

    // Per-user statistical outlier flag with ZERO float arithmetic — the
    // "2σ rule" (c − μ)² > 4·σ² restated over integer cents as
    // (c·n − sum)² > 4·(n·sumsq − sum²): multiplying through by n²
    // eliminates both the mean's division and the variance's, so the flag
    // is exact BIGINT algebra with no engine-rounding boundary (the
    // data-dependent-gate class the as-of/mixture fixes removed — here
    // removed by construction). One whole-partition window over the
    // (user_id) exchange computes n/sum/sumsq; the comparison is map-side.
    // Magnitudes: cents ≤ ~1e5, per-user n ≤ ~1e3 ⇒ (c·n)² ≤ 1e16 < 2⁶³.
    "q_events_outliers" -> Q(
      t => {
        val w = Window.partitionBy(col("user_id"))
        t.events
          .select(col("event_id"), col("user_id"),
            cents(col("value")).cast("long").as("c"))
          .withColumn("n", count(lit(1)).over(w))
          .withColumn("s", sum(col("c")).over(w))
          .withColumn("s2", sum(col("c") * col("c")).over(w))
          .select(col("event_id"), col("user_id"), col("c"),
            ((col("c") * col("n") - col("s")) * (col("c") * col("n") - col("s")) >
              lit(4L) * (col("n") * col("s2") - col("s") * col("s")))
              .as("is_outlier"))
          .filter(col("is_outlier"))
          .orderBy(col("event_id"), col("user_id"), col("c"), col("is_outlier"))
      },
      Some("""WITH e AS (
              |  SELECT event_id, user_id,
              |         CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
              |  FROM events
              |), st AS (
              |  SELECT event_id, user_id, c,
              |         CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n,
              |         CAST(sum(c) OVER (PARTITION BY user_id) AS BIGINT) AS s,
              |         CAST(sum(c * c) OVER (PARTITION BY user_id) AS BIGINT) AS s2
              |  FROM e
              |)
              |SELECT event_id, user_id, c,
              |       (c * n - s) * (c * n - s) > 4 * (n * s2 - s * s) AS is_outlier
              |FROM st
              |WHERE (c * n - s) * (c * n - s) > 4 * (n * s2 - s * s)
              |ORDER BY event_id NULLS FIRST, user_id NULLS FIRST,
              |         c NULLS FIRST, is_outlier NULLS FIRST""".stripMargin)),

    // RFM segmentation — the classic behavioral scoring: per user,
    // Recency (whole days since last event, against the corpus max-ts
    // anchor), Frequency (event count), Monetary (exact cents sum), each
    // banded 1-3 by fixed thresholds and fused into one segment code.
    // All integer arithmetic: recency in whole days via integer µs
    // division, monetary in cents — no float banding boundary. Scale
    // shape: ONE partial-agg'd shuffle on user_id computes all three
    // (max/count/sum are algebraic), the one-row anchor rejoins as a
    // broadcast cross join, and banding is map-side on the aggregate.
    "q_events_rfm" -> Q(
      t => {
        val per = t.events.groupBy(col("user_id")).agg(
          max(expr("unix_micros(ts)")).as("last_us"),
          count(lit(1)).as("freq"),
          sum(cents(col("value")).cast("long")).as("monetary_cents"))
        val anchor = per.agg(max(col("last_us")).as("anchor_us"))
        per.crossJoin(broadcast(anchor))
          .withColumn("recency_days",
            expr("(anchor_us - last_us) div 86400000000"))
          .withColumn("r_score",
            when(col("recency_days") <= 7, 3L).when(col("recency_days") <= 30, 2L).otherwise(1L))
          .withColumn("f_score",
            when(col("freq") >= 20, 3L).when(col("freq") >= 5, 2L).otherwise(1L))
          .withColumn("m_score",
            when(col("monetary_cents") >= 100000, 3L)
              .when(col("monetary_cents") >= 10000, 2L).otherwise(1L))
          .select(col("user_id"), col("recency_days"), col("freq"),
            col("monetary_cents"),
            (col("r_score") * 100 + col("f_score") * 10 + col("m_score")).as("segment"))
          .orderBy(col("user_id"), col("recency_days"), col("freq"),
            col("monetary_cents"), col("segment"))
      },
      Some("""WITH per AS (
              |  SELECT user_id,
              |         MAX(epoch_us(CAST(ts AS TIMESTAMP))) AS last_us,
              |         CAST(COUNT(*) AS BIGINT) AS freq,
              |         CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS monetary_cents
              |  FROM events GROUP BY user_id
              |), anchor AS (
              |  SELECT MAX(last_us) AS anchor_us FROM per
              |), scored AS (
              |  SELECT user_id, (anchor_us - last_us) // 86400000000 AS recency_days,
              |         freq, monetary_cents
              |  FROM per CROSS JOIN anchor
              |)
              |SELECT user_id, recency_days, freq, monetary_cents,
              |       CAST((CASE WHEN recency_days <= 7 THEN 3
              |             WHEN recency_days <= 30 THEN 2 ELSE 1 END) * 100
              |       + (CASE WHEN freq >= 20 THEN 3
              |               WHEN freq >= 5 THEN 2 ELSE 1 END) * 10
              |       + (CASE WHEN monetary_cents >= 100000 THEN 3
              |               WHEN monetary_cents >= 10000 THEN 2 ELSE 1 END) AS BIGINT) AS segment
              |FROM scored
              |ORDER BY user_id NULLS FIRST, recency_days NULLS FIRST,
              |         freq NULLS FIRST, monetary_cents NULLS FIRST,
              |         segment NULLS FIRST""".stripMargin)),

    // Bitwise aggregates — bit_and/bit_or/bit_xor over group members
    // (the bitmap-index / flag-set primitives): fully associative and
    // commutative integer ops, so partial-agg merge order cannot affect
    // the result on any engine at any parallelism — the best-case
    // aggregate for the 100 TB map-side-combine path.
    "q_agg_bitwise" -> Q(
      t => t.lineitem
        .groupBy(col("l_returnflag"))
        .agg(expr("bit_and(l_orderkey)").as("k_and"),
          expr("bit_or(l_orderkey)").as("k_or"),
          expr("bit_xor(l_orderkey)").as("k_xor"),
          expr("bit_count(bit_or(l_orderkey))").cast("long").as("or_bits"))
        .orderBy(col("l_returnflag"), col("k_and"), col("k_or"),
          col("k_xor"), col("or_bits")),
      Some("""SELECT l_returnflag,
              |       bit_and(l_orderkey) AS k_and,
              |       bit_or(l_orderkey) AS k_or,
              |       bit_xor(l_orderkey) AS k_xor,
              |       CAST(bit_count(bit_or(l_orderkey)) AS BIGINT) AS or_bits
              |FROM lineitem
              |GROUP BY l_returnflag
              |ORDER BY l_returnflag NULLS FIRST, k_and NULLS FIRST,
              |         k_or NULLS FIRST, k_xor NULLS FIRST,
              |         or_bits NULLS FIRST""".stripMargin)),

    // TPC-H Q11's shape — group value share against a global scalar gate:
    // per-part inventory value restricted to one region's suppliers
    // (region rather than Q11's single nation: the smallest test SF has
    // nations with zero suppliers, and a surface whose flagship rows>0
    // smoke depends on dim-row luck is a flaky contract),
    // keeping parts whose value exceeds 1/1000 of the filtered total.
    // The share test is stated MULTIPLICATIVELY on exact cent BIGINTs
    // (value·1000 > total — no division, no float, no rounding boundary
    // for the gate to sit on). Scale shape: the one-row total reduces
    // map-side and rejoins as a broadcast cross join (the
    // q_join_dormant_rich scalar-gate pattern), the per-part aggregate is
    // one partial-agg'd shuffle on partkey, and the nation-filtered
    // supplier dim broadcasts. The HAVING filter runs post-broadcast,
    // map-side on the aggregated rows.
    "q_agg_value_share" -> Q(
      t => {
        val sn = t.supplier.join(
            broadcast(t.nation
              .join(broadcast(t.region.filter(col("r_name") === "EUROPE")
                .select(col("r_regionkey"))),
                col("n_regionkey") === col("r_regionkey"))
              .select(col("n_nationkey"))),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"))
        val per = t.lineitem
          .join(broadcast(sn), col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("l_partkey").as("p_partkey"))
          .agg(sum(cents(col("l_extendedprice")).cast("long")).as("value_cents"))
        val tot = per.agg(sum(col("value_cents")).as("total_cents"))
        per.crossJoin(broadcast(tot))
          .filter(col("value_cents") * 1000 > col("total_cents"))
          .select(col("p_partkey"), col("value_cents"))
          .orderBy(col("value_cents").desc_nulls_last, col("p_partkey"))
      },
      Some("""WITH per AS (
              |  SELECT l_partkey AS p_partkey,
              |         CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS value_cents
              |  FROM lineitem
              |  JOIN supplier ON l_suppkey = s_suppkey
              |  JOIN nation   ON s_nationkey = n_nationkey
              |  JOIN region   ON n_regionkey = r_regionkey
              |  WHERE r_name = 'EUROPE'
              |  GROUP BY 1
              |), tot AS (
              |  SELECT CAST(SUM(value_cents) AS BIGINT) AS total_cents FROM per
              |)
              |SELECT p_partkey, value_cents
              |FROM per CROSS JOIN tot
              |WHERE value_cents * 1000 > total_cents
              |ORDER BY value_cents DESC NULLS LAST, p_partkey NULLS FIRST""".stripMargin)))
}
