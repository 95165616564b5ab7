package graft.queries

import org.apache.spark.sql.functions._

/** Data-quality profiling and constraint validation — the Deequ-shaped
  * pre-training gate every large pipeline runs before a corpus or feature
  * table is trusted (profile first, assert second, only then train).
  * Everything reduces to exact counts/BIGINTs or string-rendered extrema,
  * so the whole surface sits under the exact oracle gate.
  */
object ProfileQueries extends Catalog {

  /** Columns profiled by q_profile_table. Extrema are computed on the
    * NATIVE type (so min/max order numerically/temporally), then rendered
    * to string for the uniform melted schema — both engines print
    * shortest-roundtrip doubles and `yyyy-MM-dd HH:mm:ss` timestamps
    * identically at these magnitudes (exponent rendering diverges only
    * beyond 1e7, far above any profiled value).
    */
  private val ProfCols =
    Seq("l_orderkey", "l_quantity", "l_extendedprice", "l_returnflag", "l_shipdate")

  def queries: Map[String, Q] = Map(

    // Per-column table profile — row count, null count, exact distinct
    // count, min/max — melted to one row per column. ONE aggregation pass:
    // Spark plans the multi-column COUNT(DISTINCT) via a single expand
    // (|cols|× the scan, map-side partial-agg'd), which at 100 TB is the
    // standard one-shot profiling trade: |cols| semi-scans fused into one
    // shuffle round instead of |cols| separate jobs.
    "q_profile_table" -> Q(
      t => {
        val aggs = ProfCols.flatMap { c =>
          Seq(
            count(col(c)).as(s"${c}__nn"),
            count_distinct(col(c)).as(s"${c}__nd"),
            min(col(c)).cast("string").as(s"${c}__mn"),
            max(col(c)).cast("string").as(s"${c}__mx"))
        }
        val one = t.lineitem.agg(count(lit(1)).as("__n"), aggs: _*)
        one.select(explode(array(ProfCols.map { c =>
            struct(
              lit(c).as("column_name"),
              col("__n").as("n_rows"),
              (col("__n") - col(s"${c}__nn")).as("n_null"),
              col(s"${c}__nd").as("n_distinct"),
              col(s"${c}__mn").as("min_str"),
              col(s"${c}__mx").as("max_str"))
          }: _*)).as("p"))
          .select(col("p.*"))
          .orderBy(col("column_name"), col("n_rows"), col("n_null"),
            col("n_distinct"), col("min_str"), col("max_str"))
      },
      Some {
        val arms = ProfCols.map { c =>
          s"""SELECT '$c' AS column_name,
             |       (SELECT COUNT(*) FROM lineitem) AS n_rows,
             |       (SELECT COUNT(*) FROM lineitem) - COUNT($c) AS n_null,
             |       COUNT(DISTINCT $c) AS n_distinct,
             |       CAST(MIN($c) AS VARCHAR) AS min_str,
             |       CAST(MAX($c) AS VARCHAR) AS max_str
             |FROM lineitem""".stripMargin
        }
        arms.mkString("", "\nUNION ALL\n",
          """
            |ORDER BY column_name NULLS FIRST, n_rows NULLS FIRST,
            |         n_null NULLS FIRST, n_distinct NULLS FIRST,
            |         min_str NULLS FIRST, max_str NULLS FIRST""".stripMargin)
      }),

    // Constraint validation — named checks, each reporting its exact
    // violation count and a pass flag: composite-key uniqueness,
    // referential integrity (anti join), a value-range rule, and a
    // not-null rule. Each check is a filter/anti-join + count — map-side
    // or one shuffle each, unioned into a tiny report; at 100 TB the
    // checks share nothing and parallelize as independent stages.
    "q_profile_checks" -> Q(
      t => {
        def named(name: String, v: org.apache.spark.sql.DataFrame) =
          v.select(lit(name).as("check_name"), col("v").cast("long").as("n_violations"))
        val pk = named("pk_unique_lineitem",
          t.lineitem.agg(
            (count(lit(1)) - count_distinct(col("l_orderkey"), col("l_linenumber"))).as("v")))
        val fk = named("fk_orders_customer",
          t.orders.join(t.customer, col("o_custkey") === col("c_custkey"), "left_anti")
            .agg(count(lit(1)).as("v")))
        val rng = named("qty_in_1_50",
          t.lineitem.filter(col("l_quantity") < 1 || col("l_quantity") > 50)
            .agg(count(lit(1)).as("v")))
        val nn = named("shipdate_not_null",
          t.lineitem.filter(col("l_shipdate").isNull).agg(count(lit(1)).as("v")))
        pk.union(fk).union(rng).union(nn)
          .withColumn("pass", col("n_violations") === 0)
          .orderBy(col("check_name"), col("n_violations"), col("pass"))
      },
      Some("""WITH v AS (
             |  SELECT 'pk_unique_lineitem' AS check_name,
             |         CAST((SELECT COUNT(*) FROM lineitem)
             |              - (SELECT COUNT(*) FROM (SELECT DISTINCT l_orderkey, l_linenumber
             |                                       FROM lineitem)) AS BIGINT) AS n_violations
             |  UNION ALL
             |  SELECT 'fk_orders_customer',
             |         CAST((SELECT COUNT(*) FROM orders o
             |               WHERE NOT EXISTS (SELECT 1 FROM customer c
             |                                 WHERE c.c_custkey = o.o_custkey)) AS BIGINT)
             |  UNION ALL
             |  SELECT 'qty_in_1_50',
             |         CAST((SELECT COUNT(*) FROM lineitem
             |               WHERE l_quantity < 1 OR l_quantity > 50) AS BIGINT)
             |  UNION ALL
             |  SELECT 'shipdate_not_null',
             |         CAST((SELECT COUNT(*) FROM lineitem
             |               WHERE l_shipdate IS NULL) AS BIGINT)
             |)
             |SELECT check_name, n_violations, n_violations = 0 AS pass
             |FROM v
             |ORDER BY check_name NULLS FIRST, n_violations NULLS FIRST,
             |         pass NULLS FIRST""".stripMargin)),

    // Distribution-drift profile — the training-data shift monitor: split
    // the event stream into earlier/later halves at the time-range
    // midpoint, bin values on ONE shared equal-width grid (global min/max
    // anchored, like q_agg_histogram), and report each bin's per-cohort
    // occupancy share in exact integer micro-units plus their absolute
    // drift. The PSI/KL formulations need log(); per-bin share deltas
    // carry the same decision signal (which bins moved, by how much)
    // with every number an exact BIGINT — the gate stays division-order
    //-free because each share is ONE integer division. Scale shape: one
    // corpus scan → a 4-scalar aggregate broadcast back → one
    // (cohort, bin)-group partial agg (≤ 16 groups); the conditional
    // pivot runs on the 16-row relation. Nothing here grows with the
    // corpus except the first scan.
    "q_profile_drift" -> Q(
      t => {
        val ev = t.events.select(expr("unix_micros(ts)").as("us"),
          cents(col("value")).cast("long").as("c"))
        val mm = ev.agg(min(col("us")).as("t0"), max(col("us")).as("t1"),
          min(col("c")).as("lo"), max(col("c")).as("hi"))
        val counts = ev.crossJoin(broadcast(mm))
          .select(
            when(col("us") * 2 <= col("t0") + col("t1"), lit(0L))
              .otherwise(lit(1L)).as("cohort"),
            expr("(c - lo) * 8 div (hi - lo + 1)").as("bin"))
          .groupBy(col("cohort"), col("bin")).agg(count(lit(1)).as("o"))
        val tot = counts.groupBy(col("cohort")).agg(sum(col("o")).as("n"))
        counts.join(broadcast(tot), "cohort")
          .withColumn("share_u", expr("o * 1000000 div n"))
          .groupBy(col("bin"))
          .agg(
            coalesce(max(when(col("cohort") === 0, col("o"))), lit(0L)).as("o1"),
            coalesce(max(when(col("cohort") === 1, col("o"))), lit(0L)).as("o2"),
            coalesce(max(when(col("cohort") === 0, col("share_u"))), lit(0L))
              .as("share1_u"),
            coalesce(max(when(col("cohort") === 1, col("share_u"))), lit(0L))
              .as("share2_u"))
          .withColumn("drift_u", abs(col("share1_u") - col("share2_u")))
          .orderBy(col("bin"))
      },
      Some("""WITH ev AS (
             |  SELECT epoch_us(CAST(ts AS TIMESTAMP)) AS us,
             |         CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
             |  FROM events
             |), mm AS (
             |  SELECT MIN(us) AS t0, MAX(us) AS t1, MIN(c) AS lo, MAX(c) AS hi
             |  FROM ev
             |), o AS (
             |  SELECT CASE WHEN us * 2 <= t0 + t1 THEN 0 ELSE 1 END AS cohort,
             |         ((c - lo) * 8 // (hi - lo + 1)) AS bin,
             |         CAST(COUNT(*) AS BIGINT) AS o
             |  FROM ev CROSS JOIN mm
             |  GROUP BY 1, 2
             |), n AS (
             |  SELECT cohort, CAST(SUM(o) AS BIGINT) AS n FROM o GROUP BY 1
             |), s AS (
             |  SELECT bin, o.cohort, o.o, (o.o * 1000000 // n.n) AS share_u
             |  FROM o JOIN n USING (cohort)
             |)
             |SELECT bin,
             |       COALESCE(MAX(CASE WHEN cohort = 0 THEN o END), 0) AS o1,
             |       COALESCE(MAX(CASE WHEN cohort = 1 THEN o END), 0) AS o2,
             |       COALESCE(MAX(CASE WHEN cohort = 0 THEN share_u END), 0) AS share1_u,
             |       COALESCE(MAX(CASE WHEN cohort = 1 THEN share_u END), 0) AS share2_u,
             |       abs(COALESCE(MAX(CASE WHEN cohort = 0 THEN share_u END), 0)
             |           - COALESCE(MAX(CASE WHEN cohort = 1 THEN share_u END), 0))
             |         AS drift_u
             |FROM s GROUP BY bin
             |ORDER BY bin NULLS FIRST""".stripMargin)))
}
