package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window functions, sort/limit, per-group top-k (SURVEY.md §2C windows/sort
  * rows). Determinism: ranking functions whose value depends on total order
  * (row_number, ntile) always order over a unique key suffix; tie-tolerant
  * functions (rank, dense_rank, percent_rank) may order over the tied bucket
  * alone.
  */
object Windows extends Catalog {

  def queries: Map[String, Q] = Map(

    // Distribution window functions — ntile quartiles, percent_rank, and
    // exact share-of-partition. Numeric contract: the ordering key and the
    // share arithmetic run on BIGINT cents (double window sums are not
    // order-defined cross-engine — see q_win_running_frames), the share is
    // integer micro-units (`div`; values are positive so truncating and
    // flooring division agree on both engines), and percent_rank's
    // (rank−1)/(n−1) is the same IEEE division of exact small ints on both.
    // ntile orders over a unique key suffix: bucket assignment depends on
    // the total order, so the SQL-spec ceiling split is only deterministic
    // with ties broken. One shuffle on the partition key; all four window
    // functions share the single sorted pass.
    "q_win_ntile_dist" -> Q(
      t => {
        val wp = Window.partitionBy(col("o_orderpriority"))
        val w = wp.orderBy(col("c").desc, col("o_orderkey"))
        t.orders
          .withColumn("c", cents(col("o_totalprice")).cast("long"))
          .withColumn("total_c", sum(col("c")).over(wp))
          .select(col("o_orderkey"), col("o_orderpriority"), col("c"),
            ntile(4).over(w).cast("long").as("quartile"),
            percent_rank().over(w).as("pr"),
            expr("c * 1000000 div total_c").as("share_micro"))
          .orderBy(col("o_orderkey"), col("o_orderpriority"), col("c"),
            col("quartile"), col("pr"), col("share_micro"))
      },
      Some("""WITH f AS (
             |  SELECT o_orderkey, o_orderpriority,
             |         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c
             |  FROM orders
             |)
             |SELECT o_orderkey, o_orderpriority, c,
             |       CAST(ntile(4) OVER w AS BIGINT) AS quartile,
             |       percent_rank() OVER w AS pr,
             |       CAST(c * 1000000 //
             |            CAST(sum(c) OVER (PARTITION BY o_orderpriority) AS BIGINT)
             |            AS BIGINT) AS share_micro
             |FROM f
             |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY c DESC, o_orderkey)
             |ORDER BY o_orderkey NULLS FIRST, o_orderpriority NULLS FIRST,
             |         c NULLS FIRST, quartile NULLS FIRST, pr NULLS FIRST,
             |         share_micro NULLS FIRST""".stripMargin)),

    // Running COUNT DISTINCT per user — the windowed aggregate Spark does
    // not ship (no DISTINCT inside window frames), stated as its standard
    // scale rewrite: a first-occurrence flag (row_number = 1 over
    // (user, value)) followed by a running SUM of flags over the user
    // stream. Two windows on DIFFERENT partition keys = two exchanges —
    // that is the honest cost of exact running distinct at 100 TB (state
    // per (user, value) pair); sketches (HLL per frame) are the inexact
    // alternative. The oracle is DuckDB's NATIVE windowed
    // COUNT(DISTINCT ...), a genuinely independent executor of the same
    // semantics, so the gate proves the rewrite rather than replaying it.
    "q_win_running_distinct" -> Q(
      t => {
        val first = Window.partitionBy(col("user_id"), col("event_type"))
          .orderBy(col("ts"), col("event_id"))
        val run = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t.events
          .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
          .withColumn("is_first",
            when(row_number().over(first) === 1, 1L).otherwise(0L))
          .withColumn("n_types_so_far", sum(col("is_first")).over(run))
          .select(col("event_id"), col("user_id"), col("n_types_so_far"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT event_id, user_id,
              |       CAST(COUNT(DISTINCT event_type) OVER (
              |         PARTITION BY user_id ORDER BY ts, event_id
              |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              |         AS BIGINT) AS n_types_so_far
              |FROM events
              |ORDER BY event_id NULLS FIRST""".stripMargin)),

    "q_win_rank" -> Q(
      t => {
        val df = t.customer
          .withColumn("bal_bucket", floor(col("c_acctbal") / 1000).cast("long"))
        val unique = Window.partitionBy(col("c_nationkey")).orderBy(col("bal_bucket"), col("c_custkey"))
        val tied = Window.partitionBy(col("c_nationkey")).orderBy(col("bal_bucket"))
        df.select(
          col("c_custkey"), col("c_nationkey"), col("bal_bucket"),
          // ranking fns are INTEGER in Spark, BIGINT in DuckDB; the driver
          // happens to normalize 32/64-bit widths but that tolerance is
          // observed, not contractual — cast to BIGINT on our side.
          row_number().over(unique).cast("long").as("rn"),
          rank().over(tied).cast("long").as("rnk"),
          dense_rank().over(tied).cast("long").as("drnk"),
          ntile(4).over(unique).cast("long").as("quartile"),
          round(percent_rank().over(tied), 4).as("pct_rank"))
          .orderBy(col("c_custkey"), col("c_nationkey"), col("bal_bucket"),
            col("rn"), col("rnk"), col("drnk"), col("quartile"), col("pct_rank"))
      },
      Some("""SELECT c_custkey, c_nationkey,
                     CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS bal_bucket,
                     row_number() OVER (PARTITION BY c_nationkey
                                        ORDER BY CAST(FLOOR(c_acctbal / 1000) AS BIGINT), c_custkey) AS rn,
                     rank() OVER (PARTITION BY c_nationkey
                                  ORDER BY CAST(FLOOR(c_acctbal / 1000) AS BIGINT)) AS rnk,
                     dense_rank() OVER (PARTITION BY c_nationkey
                                        ORDER BY CAST(FLOOR(c_acctbal / 1000) AS BIGINT)) AS drnk,
                     ntile(4) OVER (PARTITION BY c_nationkey
                                    ORDER BY CAST(FLOOR(c_acctbal / 1000) AS BIGINT), c_custkey) AS quartile,
                     ROUND(percent_rank() OVER (PARTITION BY c_nationkey
                                                ORDER BY CAST(FLOOR(c_acctbal / 1000) AS BIGINT)), 4) AS pct_rank
              FROM customer
              ORDER BY c_custkey NULLS FIRST, c_nationkey NULLS FIRST, bal_bucket NULLS FIRST,
                       rn NULLS FIRST, rnk NULLS FIRST, drnk NULLS FIRST,
                       quartile NULLS FIRST, pct_rank NULLS FIRST""")),

    // Full-precision events.value leaves the plan as BIGINT cents (see
    // Catalog.cents): lag/lead/delta over integers are immune to the
    // engine-round .5 divergence that bit q_win_sessionize.
    // Value window functions (the §2C windows surface q_win_rank leaves
    // out): first/last/nth over an explicit FULL frame — the default
    // running frame would make last/nth order-dependent prefixes — plus
    // cume_dist over the tied bucket. All value columns ride a unique-key
    // total order, so every output is deterministic; cume_dist is an exact
    // integer ratio → identical doubles on both engines.
    "q_win_value_fns" -> Q(
      t => {
        val df = t.customer
          .withColumn("bal_bucket", floor(col("c_acctbal") / 1000).cast("long"))
        val unique = Window.partitionBy(col("c_nationkey"))
          .orderBy(col("bal_bucket"), col("c_custkey"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        val tied = Window.partitionBy(col("c_nationkey")).orderBy(col("bal_bucket"))
        df.select(
          col("c_custkey"), col("c_nationkey"), col("bal_bucket"),
          first(col("c_custkey")).over(unique).as("first_key"),
          last(col("c_custkey")).over(unique).as("last_key"),
          nth_value(col("c_custkey"), 2).over(unique).as("second_key"),
          round(cume_dist().over(tied), 4).as("cdist"))
          .orderBy(col("c_custkey"), col("c_nationkey"), col("bal_bucket"),
            col("first_key"), col("last_key"), col("second_key"), col("cdist"))
      },
      Some("""SELECT c_custkey, c_nationkey,
             |       CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS bal_bucket,
             |       first_value(c_custkey) OVER w AS first_key,
             |       last_value(c_custkey) OVER w AS last_key,
             |       nth_value(c_custkey, 2) OVER w AS second_key,
             |       ROUND(cume_dist() OVER (PARTITION BY c_nationkey
             |         ORDER BY CAST(FLOOR(c_acctbal / 1000) AS BIGINT)), 4) AS cdist
             |FROM customer
             |WINDOW w AS (PARTITION BY c_nationkey
             |             ORDER BY CAST(FLOOR(c_acctbal / 1000) AS BIGINT), c_custkey
             |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             |ORDER BY c_custkey NULLS FIRST, c_nationkey NULLS FIRST,
             |         bal_bucket NULLS FIRST, first_key NULLS FIRST,
             |         last_key NULLS FIRST, second_key NULLS FIRST,
             |         cdist NULLS FIRST""".stripMargin)),

    "q_win_lag_lead" -> Q(
      t => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        t.events
          .withColumn("c", cents(col("value")))
          .select(
            col("event_id"),
            col("user_id"),
            lag(col("c"), 1).over(w).as("prev_cents"),
            lead(col("c"), 1).over(w).as("next_cents"),
            (col("c") - lag(col("c"), 1).over(w)).as("delta_cents"))
          .orderBy(col("event_id"), col("user_id"), col("prev_cents"),
            col("next_cents"), col("delta_cents"))
      },
      Some("""SELECT event_id, user_id,
                     lag(c, 1) OVER w AS prev_cents,
                     lead(c, 1) OVER w AS next_cents,
                     c - lag(c, 1) OVER w AS delta_cents
              FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
                           CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
                    FROM events)
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
              ORDER BY event_id NULLS FIRST, user_id NULLS FIRST, prev_cents NULLS FIRST,
                       next_cents NULLS FIRST, delta_cents NULLS FIRST""")),

    // Window aggregates over doubles are NOT order-defined cross-engine:
    // DuckDB evaluates windowed SUM/AVG with a segment tree (tree-shaped
    // accumulation), Spark with running accumulation — the pre-round values
    // can differ in the last bit and flip a .5-cent rounding (hit at sf0.1:
    // run_avg 291363.70 vs .71 on identical input). So every aggregate here
    // runs on BIGINT cents: integer window sums are exact under ANY
    // accumulation order, and the one remaining division (avg) is the same
    // IEEE op sequence on both engines.
    "q_win_running_frames" -> Q(
      t => {
        val df = t.orders
          .withColumn("dayn",
            datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date")))
          .withColumn("c", cents(col("o_totalprice")).cast("long"))
        // The rows-frames order by (dayn, o_orderdate, o_orderkey) — with
        // dayn PREPENDED to the oracle's (o_orderdate, o_orderkey)
        // spelling — so the range window's required ordering (custkey,
        // dayn) is a PREFIX of the rows-windows' sort and one sort serves
        // all three window specs instead of two sorts per partition pass
        // (r18). Keeping o_orderdate as the middle key (r19, closing the
        // r18 ADVICE note) makes the equivalence UNCONDITIONAL: dayn is a
        // function of o_orderdate (its day floor), so sorting by (dayn,
        // o_orderdate, …) is the same total order as (o_orderdate, …) for
        // ANY data — including intraday timestamps a future loader might
        // produce — not just the midnight-aligned dates the r18 form
        // relied on. The extra key costs one comparison word per row; the
        // plan keeps the single shared Sort (plans/r18 capture still
        // applies: 2 Sort nodes).
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("dayn"), col("o_orderdate"), col("o_orderkey"))
        val running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val sliding = w.rowsBetween(-2, Window.currentRow)
        val dayRange = Window.partitionBy(col("o_custkey")).orderBy(col("dayn")).rangeBetween(-30, 0)
        df.select(
          col("o_custkey"), col("o_orderkey"),
          sum(col("c")).over(running).as("run_sum_cents"),
          floor(sum(col("c")).over(running).cast("double") / count(lit(1)).over(running))
            .as("run_avg_cents"),
          min(col("c")).over(running).as("run_min_cents"),
          max(col("c")).over(running).as("run_max_cents"),
          floor(sum(col("c")).over(sliding).cast("double") / count(lit(1)).over(sliding))
            .as("slide3_avg_cents"),
          sum(col("c")).over(dayRange).as("sum_30d_cents"))
          .orderBy(col("o_custkey"), col("o_orderkey"), col("run_sum_cents"),
            col("run_avg_cents"), col("run_min_cents"), col("run_max_cents"),
            col("slide3_avg_cents"), col("sum_30d_cents"))
      },
      Some("""SELECT o_custkey, o_orderkey,
                     CAST(sum(c) OVER w_run AS BIGINT) AS run_sum_cents,
                     CAST(FLOOR(CAST(sum(c) OVER w_run AS DOUBLE)
                                / count(*) OVER w_run) AS BIGINT) AS run_avg_cents,
                     CAST(min(c) OVER w_run AS BIGINT) AS run_min_cents,
                     CAST(max(c) OVER w_run AS BIGINT) AS run_max_cents,
                     CAST(FLOOR(CAST(sum(c) OVER w_slide AS DOUBLE)
                                / count(*) OVER w_slide) AS BIGINT) AS slide3_avg_cents,
                     CAST(sum(c) OVER w_range AS BIGINT) AS sum_30d_cents
              FROM (SELECT *, date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS dayn,
                           CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c
                    FROM orders)
              WINDOW
                w_run AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                w_slide AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
                w_range AS (PARTITION BY o_custkey ORDER BY dayn
                            RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
              ORDER BY o_custkey NULLS FIRST, o_orderkey NULLS FIRST, run_sum_cents NULLS FIRST,
                       run_avg_cents NULLS FIRST, run_min_cents NULLS FIRST, run_max_cents NULLS FIRST,
                       slide3_avg_cents NULLS FIRST, sum_30d_cents NULLS FIRST""")),

    "q_win_topk_per_group" -> Q(
      t => {
        val w = Window.partitionBy(col("c_mktsegment"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        t.orders
          .join(t.customer, col("o_custkey") === col("c_custkey"))
          .withColumn("rn", row_number().over(w).cast("long"))
          .filter(col("rn") <= 3)
          .select(col("c_mktsegment"), col("rn"), col("o_orderkey"),
            round(col("o_totalprice"), 2).as("total"))
          .orderBy(col("c_mktsegment"), col("rn"), col("o_orderkey"), col("total"))
      },
      Some("""SELECT c_mktsegment, rn, o_orderkey, total FROM (
                SELECT c_mktsegment, o_orderkey, ROUND(o_totalprice, 2) AS total,
                       row_number() OVER (PARTITION BY c_mktsegment
                                          ORDER BY o_totalprice DESC, o_orderkey) AS rn
                FROM orders JOIN customer ON o_custkey = c_custkey)
              WHERE rn <= 3
              ORDER BY c_mktsegment NULLS FIRST, rn NULLS FIRST,
                       o_orderkey NULLS FIRST, total NULLS FIRST""")),

    // Batch sessionization: the window-function formulation of
    // session_window (gap > 30 min starts a new session), expressible on
    // both engines — session id = running count of gap-breaks per user.
    "q_win_sessionize" -> Q(
      t => {
        val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        t.events
          .withColumn("gap_s",
            unix_timestamp(col("ts")) - unix_timestamp(lag(col("ts"), 1).over(byUser)))
          .withColumn("new_session",
            when(col("gap_s").isNull || col("gap_s") > 1800, 1).otherwise(0))
          .withColumn("session_id",
            sum(col("new_session")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
          .groupBy(col("user_id"), col("session_id"))
          .agg(
            count(lit(1)).as("n_events"),
            date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_start"),
            // BIGINT cents end-to-end (see Catalog.cents): events.value is a
            // full-precision double, so any engine round() can disagree at
            // exact-.5 boundaries; floor(x·100+0.5) + integer sum is
            // order-independent AND engine-version-independent. No double
            // ever leaves this plan.
            sum(cents(col("value"))).as("session_cents"))
          .orderBy(col("user_id"), col("session_id"), col("n_events"),
            col("session_start"), col("session_cents"))
      },
      Some("""WITH g AS (
              |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value,
              |         CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT)
              |           - CAST(floor(epoch(lag(CAST(ts AS TIMESTAMP), 1)
              |               OVER (PARTITION BY user_id ORDER BY ts, event_id))) AS BIGINT) AS gap_s
              |  FROM events
              |), s AS (
              |  -- window SUM of ints is HUGEINT (int128) in DuckDB; the driver's hasher
              |  -- distinguishes int128 from Spark's BIGINT even when values match
              |  -- (root cause of the r1-r3 hash mismatch) — CAST is mandatory.
              |  SELECT user_id, ts, value,
              |         CAST(SUM(CASE WHEN gap_s IS NULL OR gap_s > 1800 THEN 1 ELSE 0 END)
              |           OVER (PARTITION BY user_id ORDER BY ts, event_id
              |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
              |  FROM g
              |)
              |SELECT user_id, session_id, COUNT(*) AS n_events,
              |       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
              |       CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS session_cents
              |FROM s
              |GROUP BY user_id, session_id
              |ORDER BY user_id NULLS FIRST, session_id NULLS FIRST, n_events NULLS FIRST,
              |         session_start NULLS FIRST, session_cents NULLS FIRST""".stripMargin)),

    "q_sort_limit" -> Q(
      t => t.orders
        .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("total"))
        .orderBy(col("total").desc_nulls_last, col("o_orderkey"))
        .limit(15),
      Some("""SELECT o_orderkey, ROUND(o_totalprice, 2) AS total
              FROM orders
              ORDER BY total DESC NULLS LAST, o_orderkey
              LIMIT 15""")),

    // SCD Type-2 interval derivation — turn an append-only event stream
    // into versioned validity ranges (the warehouse dimension-history /
    // CDC-compaction primitive): per user, each event opens a version
    // valid [its ts, next event's ts); the last version is open-ended.
    // One window over (user_id; ts, event_id) serves lead() AND
    // row_number() — a single exchange + in-partition sort, no second
    // shuffle. The unique event_id suffix makes equal-ts orders (and so
    // the version numbering) deterministic on both engines; timestamps
    // compare as exact integer µs.
    // SCD2 dimension MAINTENANCE — the write-side twin of q_win_scd2's
    // build and q_join_point_in_time's read: an existing version table
    // (built from the first time-half) absorbs a change batch (the second
    // half) by closing each affected user's open version and appending
    // new ones, and the gate proves applied(state, delta) ≡ rebuild(all)
    // — the q_agg_incremental contract lifted from aggregates to validity
    // INTERVALS, which is what lets a 100 TB dimension absorb a daily
    // change feed without rescanning history. Scale shape: untouched
    // users pass through via one anti join; the re-window runs ONLY on
    // (open row + delta) per affected user — O(|delta| + |affected|),
    // never O(|state|); every exchange is user-keyed. Version continuity:
    // delta rows number from the open row's version (base = version − 1
    // carried on the open row, max-broadcast per user window), so the
    // applied numbering is identical to the rebuild's row_number. The
    // time split guarantees delta times exceed the open version's start,
    // so the open row always sorts first in the merged window.
    "q_merge_scd2_apply" -> Q(
      t => {
        val ev = t.events.select(col("user_id"), col("event_type"),
          expr("unix_micros(ts)").as("us"), col("event_id"))
        val mm = ev.agg(min(col("us")).as("t0"), max(col("us")).as("t1"))
        val tagged = ev.crossJoin(broadcast(mm))
          .withColumn("is_state", col("us") * 2 <= col("t0") + col("t1"))
          .localCheckpoint(true)
        val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
        // state feeds THREE consumers (untouched / closed / open) and
        // affected feeds three joins — eager checkpoints so the version
        // window and the distinct run once, not per branch (the
        // q_join_waiting_suppliers multi-arm discipline)
        val state = tagged.filter(col("is_state"))
          .select(col("user_id"), col("event_type"), col("us"), col("event_id"))
          .withColumn("version", row_number().over(w).cast("long"))
          .withColumn("valid_to_us", lead(col("us"), 1).over(w))
          .localCheckpoint(true)
        val delta = tagged.filter(!col("is_state"))
          .select(col("user_id"), col("event_type"), col("us"), col("event_id"))
        val affected = delta.select(col("user_id")).distinct().localCheckpoint(true)
        val untouched = state.join(affected, Seq("user_id"), "left_anti")
          .select(col("user_id"), col("version"), col("event_type"),
            col("us").as("valid_from_us"), col("valid_to_us"),
            col("valid_to_us").isNull.as("is_current"))
        val aState = state.join(affected, Seq("user_id"))
        val closed = aState.filter(col("valid_to_us").isNotNull)
          .select(col("user_id"), col("version"), col("event_type"),
            col("us").as("valid_from_us"), col("valid_to_us"),
            lit(false).as("is_current"))
        val open = aState.filter(col("valid_to_us").isNull)
          .select(col("user_id"), col("event_type"), col("us"), col("event_id"),
            (col("version") - 1).as("base"))
        val merged = open.unionByName(
          delta.withColumn("base", lit(null).cast("long")))
        val bw = Window.partitionBy(col("user_id"))
        val applied = merged
          .withColumn("version",
            coalesce(max(col("base")).over(bw), lit(0L)) + row_number().over(w))
          .withColumn("valid_to_us", lead(col("us"), 1).over(w))
          .select(col("user_id"), col("version"), col("event_type"),
            col("us").as("valid_from_us"), col("valid_to_us"),
            col("valid_to_us").isNull.as("is_current"))
        untouched.unionByName(closed).unionByName(applied)
          .orderBy(col("user_id"), col("version"))
      },
      // the oracle is the ONE-SHOT REBUILD over the full stream — the
      // strongest possible statement of the maintenance contract
      Some("""WITH e AS (
              |  SELECT user_id, event_type,
              |         epoch_us(CAST(ts AS TIMESTAMP)) AS valid_from_us, event_id
              |  FROM events
              |)
              |SELECT user_id,
              |       CAST(row_number() OVER w AS BIGINT) AS version,
              |       event_type, valid_from_us,
              |       lead(valid_from_us, 1) OVER w AS valid_to_us,
              |       (lead(valid_from_us, 1) OVER w IS NULL) AS is_current
              |FROM e
              |WINDOW w AS (PARTITION BY user_id ORDER BY valid_from_us, event_id)
              |ORDER BY user_id NULLS FIRST, version NULLS FIRST""".stripMargin)),

    "q_win_scd2" -> Q(
      t => {
        val e = t.events.select(col("user_id"), col("event_type"),
          expr("unix_micros(ts)").as("valid_from_us"), col("event_id"))
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("valid_from_us"), col("event_id"))
        e.withColumn("version", row_number().over(w).cast("long"))
          .withColumn("valid_to_us", lead(col("valid_from_us"), 1).over(w))
          .withColumn("is_current", col("valid_to_us").isNull)
          .select(col("user_id"), col("version"), col("event_type"),
            col("valid_from_us"), col("valid_to_us"), col("is_current"))
          .orderBy(col("user_id"), col("version"))
      },
      Some("""WITH e AS (
              |  SELECT user_id, event_type,
              |         epoch_us(CAST(ts AS TIMESTAMP)) AS valid_from_us, event_id
              |  FROM events
              |)
              |SELECT user_id,
              |       CAST(row_number() OVER w AS BIGINT) AS version,
              |       event_type, valid_from_us,
              |       lead(valid_from_us, 1) OVER w AS valid_to_us,
              |       (lead(valid_from_us, 1) OVER w IS NULL) AS is_current
              |FROM e
              |WINDOW w AS (PARTITION BY user_id ORDER BY valid_from_us, event_id)
              |ORDER BY user_id NULLS FIRST, version NULLS FIRST""".stripMargin)),

    // Changelog compaction — materialize a snapshot from a CDC/changelog
    // stream (the lakehouse MERGE / "apply changes" primitive): per key the
    // LATEST change wins, and a terminal delete tombstone removes the key
    // from the snapshot entirely. Op derivation is deterministic from the
    // testdata ('error' = delete, else upsert); a real changelog carries the
    // op column directly — the engine shape is identical. One hash exchange
    // on the key serves both windows (row_number over the version order +
    // whole-partition change count share the partitioning; one in-partition
    // sort), so compaction costs exactly one fact shuffle at any scale —
    // the same contract flagMapGroupsWithState-style streaming upserts
    // amortize incrementally. The unique event_id suffix makes equal-ts
    // versions deterministic; value leaves as exact BIGINT cents.
    "q_win_cdc_apply" -> Q(
      t => {
        val e = t.events.select(col("user_id"), col("event_type"),
          cents(col("value")).cast("long").as("c"),
          expr("unix_micros(ts)").as("ts_us"), col("event_id"),
          when(col("event_type") === "error", "D").otherwise("U").as("op"))
        val v = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_us").desc, col("event_id").desc)
        val p = Window.partitionBy(col("user_id"))
        e.withColumn("rn", row_number().over(v))
          .withColumn("n_changes", count(lit(1)).over(p))
          .filter(col("rn") === 1 && col("op") === "U")
          .select(col("user_id"), col("event_type").as("last_type"),
            col("c").as("last_cents"), col("ts_us").as("last_ts_us"),
            col("n_changes"))
          .orderBy(col("user_id"), col("last_type"), col("last_cents"),
            col("last_ts_us"), col("n_changes"))
      },
      Some("""WITH e AS (
              |  SELECT user_id, event_type,
              |         CAST(floor(value * 100 + 0.5) AS BIGINT) AS c,
              |         epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, event_id,
              |         CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op
              |  FROM events
              |), r AS (
              |  SELECT *,
              |         row_number() OVER (PARTITION BY user_id
              |                            ORDER BY ts_us DESC, event_id DESC) AS rn,
              |         CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n_changes
              |  FROM e
              |)
              |SELECT user_id, event_type AS last_type, c AS last_cents,
              |       ts_us AS last_ts_us, n_changes
              |FROM r WHERE rn = 1 AND op = 'U'
              |ORDER BY user_id NULLS FIRST, last_type NULLS FIRST,
              |         last_cents NULLS FIRST, last_ts_us NULLS FIRST,
              |         n_changes NULLS FIRST""".stripMargin)),

    // Time-based RANGE frames — the rolling-time-window aggregate every
    // other frame in the catalog leaves out (they are all ROWS frames or
    // the unbounded default). Per user: trailing-7-day event count and
    // exact cents spend, plus a forward-1-day count (the "activity burst"
    // lookahead). Ordering by integer epoch SECONDS makes the numeric
    // RANGE frame identical on both engines (Spark rangeBetween and
    // DuckDB RANGE both take value offsets over the sort key), and makes
    // equal-second peers frame-identical by definition — RANGE includes
    // all peers, so no unique-key suffix is needed for determinism. Both
    // frames share one (user_id; sec) exchange + in-partition sort: at
    // 100 TB this is a single fact shuffle and two streaming frame scans,
    // never a per-row self-join (the naive SQL formulation of a time
    // window, O(rows·window) at best).
    "q_win_range_time" -> Q(
      t => {
        val e = t.events.select(col("event_id"), col("user_id"),
          expr("unix_micros(ts) div 1000000").as("sec"),
          cents(col("value")).cast("long").as("c"))
        val back = Window.partitionBy(col("user_id")).orderBy(col("sec"))
          .rangeBetween(-7L * 86400, 0L)
        val fwd = Window.partitionBy(col("user_id")).orderBy(col("sec"))
          .rangeBetween(1L, 86400L)
        e.select(col("event_id"), col("user_id"), col("sec"),
            count(lit(1)).over(back).as("w7_cnt"),
            sum(col("c")).over(back).as("w7_cents"),
            count(lit(1)).over(fwd).as("next1d_cnt"))
          .orderBy(col("event_id"), col("user_id"), col("sec"),
            col("w7_cnt"), col("w7_cents"), col("next1d_cnt"))
      },
      Some("""WITH e AS (
              |  SELECT event_id, user_id,
              |         epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS sec,
              |         CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
              |  FROM events
              |)
              |SELECT event_id, user_id, sec,
              |       CAST(count(*) OVER (PARTITION BY user_id ORDER BY sec
              |              RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW) AS BIGINT) AS w7_cnt,
              |       CAST(sum(c) OVER (PARTITION BY user_id ORDER BY sec
              |              RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW) AS BIGINT) AS w7_cents,
              |       CAST(count(*) OVER (PARTITION BY user_id ORDER BY sec
              |              RANGE BETWEEN 1 FOLLOWING AND 86400 FOLLOWING) AS BIGINT) AS next1d_cnt
              |FROM e
              |ORDER BY event_id NULLS FIRST, user_id NULLS FIRST, sec NULLS FIRST,
              |         w7_cnt NULLS FIRST, w7_cents NULLS FIRST, next1d_cnt NULLS FIRST""".stripMargin)),

    // Gaps-and-islands — maximal runs of CONSECUTIVE active days per user
    // (login-streak / retention-streak analytics). The classic identity:
    // day − row_number() is constant exactly within a consecutive run, so
    // islands fall out of one window pass + one regroup — never a
    // self-join or a recursive walk. Distinct from q_win_sessionize
    // (time-GAP splits on the raw event stream); this is the
    // integer-sequence form over the calendar grid. Scale shape: the only
    // corpus-sized step is the distinct (user, day) collapse — ONE shuffle
    // of events with map-side partial agg; the window and regroup shuffles
    // run on the collapsed per-day relation (≤ users × active days, orders
    // of magnitude smaller). best_start (start of the longest streak,
    // earliest on ties) is an argmin over the exact BIGINT pair
    // (−len, start_day) — min(struct) on the Spark side, a QUALIFY
    // row_number pick in the oracle; all outputs exact BIGINT.
    "q_win_gaps_islands" -> Q(
      t => {
        val days = t.events
          .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"))
          .distinct()
        val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
        val runs = days
          .withColumn("grp", col("day") - row_number().over(w))
          .groupBy(col("user_id"), col("grp"))
          .agg(count(lit(1)).as("len"), min(col("day")).as("start_day"))
        runs
          .groupBy(col("user_id"))
          .agg(sum(col("len")).as("n_days"),
            count(lit(1)).as("n_islands"),
            max(col("len")).as("max_streak"),
            min(struct((-col("len")).as("neg"), col("start_day").as("s")))
              .getField("s").as("best_start"))
          .orderBy(col("user_id"))
      },
      Some("""WITH days AS (
              |  SELECT DISTINCT user_id,
              |         epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day
              |  FROM events
              |), runs AS (
              |  SELECT user_id, grp, CAST(COUNT(*) AS BIGINT) AS len,
              |         MIN(day) AS start_day
              |  FROM (
              |    SELECT user_id, day,
              |           day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
              |    FROM days)
              |  GROUP BY 1, 2
              |), best AS (
              |  SELECT user_id, start_day AS best_start
              |  FROM runs
              |  QUALIFY row_number() OVER (PARTITION BY user_id
              |            ORDER BY len DESC, start_day) = 1
              |)
              |SELECT r.user_id,
              |       CAST(SUM(r.len) AS BIGINT) AS n_days,
              |       CAST(COUNT(*) AS BIGINT) AS n_islands,
              |       CAST(MAX(r.len) AS BIGINT) AS max_streak,
              |       MIN(b.best_start) AS best_start
              |FROM runs r JOIN best b ON r.user_id = b.user_id
              |GROUP BY r.user_id
              |ORDER BY r.user_id NULLS FIRST""".stripMargin)))
}
