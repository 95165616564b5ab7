package graft.queries

import org.apache.spark.sql.functions._

/** Scans, projections, filters, aggregations (SURVEY.md §2C rows 1, 3-6).
  * All plans are declarative DataFrame chains — filters and projections reach
  * the parquet scan via Catalyst pushdown; aggregations are partial+final
  * HashAggregate with map-side combine for free.
  */
object Relational extends Catalog {

  def queries: Map[String, Q] = Map(
    // ---- scans / projection / filter pushdown ------------------------------
    "q_scan_project" -> Q(
      t => t.lineitem
        .filter(col("l_shipdate") < lit("1996-01-01").cast("timestamp"))
        .select(col("l_orderkey"), col("l_linenumber"), round(col("l_extendedprice"), 2).as("price"))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("price")),
      Some("""SELECT l_orderkey, l_linenumber, ROUND(l_extendedprice, 2) AS price
              FROM lineitem WHERE l_shipdate < TIMESTAMP '1996-01-01'
              ORDER BY l_orderkey NULLS FIRST, l_linenumber NULLS FIRST, price NULLS FIRST""")),

    "q_filter_predicates" -> Q(
      t => t.orders
        .filter(
          col("o_orderstatus").isin("O", "F")
            && col("o_totalprice").between(1000, 50000)
            && col("o_orderpriority").like("%URGENT%")
            && !col("o_orderkey").isNull)
        .select(col("o_orderkey"), col("o_orderstatus"), round(col("o_totalprice"), 2).as("total"))
        .orderBy(col("o_orderkey"), col("o_orderstatus"), col("total")),
      Some("""SELECT o_orderkey, o_orderstatus, ROUND(o_totalprice, 2) AS total
              FROM orders
              WHERE o_orderstatus IN ('O','F') AND o_totalprice BETWEEN 1000 AND 50000
                AND o_orderpriority LIKE '%URGENT%' AND o_orderkey IS NOT NULL
              ORDER BY o_orderkey NULLS FIRST, o_orderstatus NULLS FIRST, total NULLS FIRST""")),

    "q_filter_null_semantics" -> Q(
      t => t.events
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .withColumn("k_nulled", when(col("event_id") % 7 === 0, lit(null)).otherwise(col("k")))
        .select(
          col("event_id"),
          col("k_nulled").isNull.as("is_null"),
          (col("k_nulled") <=> (col("user_id") % 100)).as("null_safe_eq"),
          coalesce(col("k_nulled"), lit(-1)).as("k_or_default"))
        .orderBy(col("event_id"), col("is_null"), col("null_safe_eq"), col("k_or_default")),
      Some("""SELECT event_id,
                     k_nulled IS NULL AS is_null,
                     k_nulled IS NOT DISTINCT FROM (user_id % 100) AS null_safe_eq,
                     COALESCE(k_nulled, -1) AS k_or_default
              FROM (SELECT event_id, user_id,
                           CASE WHEN event_id % 7 = 0 THEN NULL
                                ELSE CAST(json_extract_string(props, '$.k') AS BIGINT) END AS k_nulled
                    FROM events)
              ORDER BY event_id NULLS FIRST, is_null NULLS FIRST,
                       null_safe_eq NULLS FIRST, k_or_default NULLS FIRST""")),

    // ---- aggregations ------------------------------------------------------
    "q_agg_pricing_summary" -> Q(
      t => graft.operators.Partitioning.fanOutNarrowScan(
          t.lineitem
            .select(col("l_returnflag"), col("l_linestatus"), col("l_quantity"),
              col("l_extendedprice"), col("l_discount"), col("l_tax"), col("l_shipdate"))
            .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          // msum/mavg/psum: fixed-point exact, order-independent aggregation
          // — see Catalog; plain double sums flip last bits with partial-
          // merge order and can break exact oracle hashing.
          round(msum(col("l_quantity")), 2).as("sum_qty"),
          round(msum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(psum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(psum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
          round(mavg(col("l_quantity")), 2).as("avg_qty"),
          round(mavg(col("l_extendedprice")), 2).as("avg_price"),
          round(mavg(col("l_discount")), 2).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus")),
      Some("""SELECT l_returnflag, l_linestatus,
                     ROUND(CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0, 2) AS sum_qty,
                     ROUND(CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0, 2) AS sum_base_price,
                     ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,6))) AS DOUBLE), 2) AS sum_disc_price,
                     ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(22,6))) AS DOUBLE), 2) AS sum_charge,
                     ROUND(CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0 / COUNT(l_quantity), 2) AS avg_qty,
                     ROUND(CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 / COUNT(l_extendedprice), 2) AS avg_price,
                     ROUND(CAST(SUM(CAST(round(l_discount * 100) AS BIGINT)) AS DOUBLE) / 100.0 / COUNT(l_discount), 2) AS avg_disc,
                     COUNT(*) AS count_order
              FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
              GROUP BY l_returnflag, l_linestatus
              ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""")),

    "q_agg_distinct" -> Q(
      t => t.lineitem
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_orderkey")).as("n_orders"),
          countDistinct(col("l_partkey")).as("n_parts"),
          round(sum_distinct(col("l_quantity")), 2).as("sum_distinct_qty"))
        .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag,
                     COUNT(DISTINCT l_orderkey) AS n_orders,
                     COUNT(DISTINCT l_partkey) AS n_parts,
                     ROUND(SUM(DISTINCT l_quantity), 2) AS sum_distinct_qty
              FROM lineitem GROUP BY l_returnflag
              ORDER BY l_returnflag NULLS FIRST""")),

    // grouping_id disambiguation — the rollup correctness subtlety: once a
    // grouped column holds DATA nulls (injected here by nulling the 'F'
    // linestatus), a result row's null cell no longer says whether it is a
    // subtotal or a real null group; grouping_id()/grouping() are the only
    // reliable discriminators, and a reader that keys on NULL instead
    // silently merges subtotals with null-group rows. Bitmask semantics
    // (Spark grouping_id() ≡ DuckDB GROUPING(rf, ls), column order
    // significant) sit under the exact gate. Quantities stay integral
    // doubles summed exactly below 2^53 → BIGINT on both engines.
    "q_agg_grouping_id" -> Q(
      t => t.lineitem
        .select(col("l_returnflag").as("rf"),
          when(col("l_linestatus") === "F", lit(null).cast("string"))
            .otherwise(col("l_linestatus")).as("ls"),
          col("l_quantity"))
        .rollup(col("rf"), col("ls"))
        .agg(grouping_id().cast("long").as("gid"),
          grouping(col("ls")).cast("long").as("g_ls"),
          count(lit(1)).as("n"), sum(col("l_quantity")).cast("long").as("qty"))
        .orderBy(col("gid"), col("rf"), col("ls"), col("g_ls"), col("n"), col("qty")),
      Some("""WITH src AS (
              |  SELECT l_returnflag AS rf,
              |         CASE WHEN l_linestatus = 'F' THEN NULL ELSE l_linestatus END AS ls,
              |         l_quantity
              |  FROM lineitem
              |)
              |SELECT rf, ls,
              |       CAST(GROUPING(rf, ls) AS BIGINT) AS gid,
              |       CAST(GROUPING(ls) AS BIGINT) AS g_ls,
              |       CAST(COUNT(*) AS BIGINT) AS n,
              |       CAST(SUM(l_quantity) AS BIGINT) AS qty
              |FROM src
              |GROUP BY ROLLUP(rf, ls)
              |ORDER BY gid NULLS FIRST, rf NULLS FIRST, ls NULLS FIRST,
              |         g_ls NULLS FIRST, n NULLS FIRST, qty NULLS FIRST""".stripMargin)),

    // Two-phase exact COUNT DISTINCT — the skew rewrite for a hot group
    // key: salt derived FROM THE VALUE (pmod(v, 16)) partitions each
    // group's distinct-value space into 16 disjoint shards, so per-shard
    // distinct counts SUM to the exact total (a salt independent of v
    // would double-count values straddling shards — the correctness edge
    // this formulation removes by construction). Phase 1's (key, salt)
    // groups spread a 50%-hot key over 16 reducers; phase 2 merges 16
    // tiny rows per key. The oracle is the PLAIN single-phase
    // COUNT(DISTINCT) — the gate proves the rewrite, not a replay.
    "q_agg_distinct_twophase" -> Q(
      t => t.lineitem
        .select(col("l_returnflag").as("k"), col("l_partkey").as("v"))
        .withColumn("salt", pmod(col("v"), lit(16L)))
        .groupBy(col("k"), col("salt"))
        .agg(countDistinct(col("v")).as("d"))
        .groupBy(col("k"))
        .agg(sum(col("d")).as("n_distinct"))
        .orderBy(col("k")),
      Some("""SELECT l_returnflag AS k,
              |       CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_distinct
              |FROM lineitem GROUP BY 1
              |ORDER BY k NULLS FIRST""".stripMargin)),

    // Filtered & boolean aggregates — count_if and bool_and/bool_or on the
    // Spark side, stated in the oracle as the standard FILTER clause and
    // the same boolean folds. All order-independent, so no rounding
    // contract is needed. Grouped over nation/region because its
    // round-robin key layout gives every flag BOTH outcomes across groups
    // (thresholds 2/13/22 split the {r, r+5, …, r+20} key sets unevenly);
    // lineitem's uniform columns would make the booleans constant.
    "q_agg_filtered" -> Q(
      t => t.nation
        .groupBy(col("n_regionkey"))
        .agg(
          expr("count_if(n_nationkey >= 13)").as("n_high"),
          expr("bool_and(n_nationkey >= 2)").as("all_ge2"),
          expr("bool_or(n_nationkey > 22)").as("any_gt22"),
          count(lit(1)).as("n"))
        .orderBy(col("n_regionkey"), col("n_high"), col("all_ge2"),
          col("any_gt22"), col("n")),
      Some("""SELECT n_regionkey,
             |       COUNT(*) FILTER (WHERE n_nationkey >= 13) AS n_high,
             |       BOOL_AND(n_nationkey >= 2) AS all_ge2,
             |       BOOL_OR(n_nationkey > 22) AS any_gt22,
             |       COUNT(*) AS n
             |FROM nation GROUP BY n_regionkey
             |ORDER BY n_regionkey NULLS FIRST, n_high NULLS FIRST,
             |         all_ge2 NULLS FIRST, any_gt22 NULLS FIRST,
             |         n NULLS FIRST""".stripMargin)),

    "q_agg_stats" -> Q(
      t => t.orders
        .groupBy(col("o_orderstatus"))
        .agg(
          count(lit(1)).as("n"),
          round(min(col("o_totalprice")), 2).as("min_price"),
          round(max(col("o_totalprice")), 2).as("max_price"),
          round(mavg(col("o_totalprice")), 2).as("avg_price"),
          countDistinct(col("o_custkey")).as("n_customers"),
          date_format(min(col("o_orderdate")), "yyyy-MM-dd").as("first_date"),
          date_format(max(col("o_orderdate")), "yyyy-MM-dd").as("last_date"))
        .orderBy(col("o_orderstatus")),
      Some("""SELECT o_orderstatus, COUNT(*) AS n,
                     ROUND(MIN(o_totalprice), 2) AS min_price,
                     ROUND(MAX(o_totalprice), 2) AS max_price,
                     ROUND(CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 / COUNT(o_totalprice), 2) AS avg_price,
                     COUNT(DISTINCT o_custkey) AS n_customers,
                     strftime(MIN(o_orderdate), '%Y-%m-%d') AS first_date,
                     strftime(MAX(o_orderdate), '%Y-%m-%d') AS last_date
              FROM orders GROUP BY o_orderstatus
              ORDER BY o_orderstatus NULLS FIRST""")),

    "q_agg_collect" -> Q(
      t => t.nation
        .groupBy(col("n_regionkey"))
        .agg(
          array_join(array_sort(collect_set(col("n_name"))), "|").as("nations"),
          count(lit(1)).as("n"))
        .orderBy(col("n_regionkey")),
      Some("""SELECT n_regionkey,
                     array_to_string(list_sort(list(DISTINCT n_name)), '|') AS nations,
                     COUNT(*) AS n
              FROM nation GROUP BY n_regionkey
              ORDER BY n_regionkey NULLS FIRST""")),

    "q_agg_rollup" -> Q(
      t => t.customer
        .join(t.nation, col("c_nationkey") === col("n_nationkey"))
        .join(t.region, col("n_regionkey") === col("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_cust"), round(msum(col("c_acctbal")), 2).as("sum_bal"))
        .select(
          coalesce(col("r_name"), lit("ALL")).as("region"),
          coalesce(col("n_name"), lit("ALL")).as("nation"),
          col("n_cust"), col("sum_bal"))
        .orderBy(col("region"), col("nation"), col("n_cust"), col("sum_bal")),
      Some("""SELECT COALESCE(r_name, 'ALL') AS region, COALESCE(n_name, 'ALL') AS nation,
                     COUNT(*) AS n_cust,
                     ROUND(CAST(SUM(CAST(round(c_acctbal * 100) AS BIGINT)) AS DOUBLE) / 100.0, 2) AS sum_bal
              FROM customer
              JOIN nation ON c_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
              GROUP BY ROLLUP(r_name, n_name)
              ORDER BY region NULLS FIRST, nation NULLS FIRST,
                       n_cust NULLS FIRST, sum_bal NULLS FIRST""")),

    "q_agg_cube" -> Q(
      t => t.orders
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), round(msum(col("o_totalprice")), 2).as("sum_total"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n"), col("sum_total"))
        .orderBy(col("status"), col("priority"), col("n"), col("sum_total")),
      Some("""SELECT COALESCE(o_orderstatus, 'ALL') AS status,
                     COALESCE(o_orderpriority, 'ALL') AS priority,
                     COUNT(*) AS n,
                     ROUND(CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0, 2) AS sum_total
              FROM orders
              GROUP BY CUBE(o_orderstatus, o_orderpriority)
              ORDER BY status NULLS FIRST, priority NULLS FIRST,
                       n NULLS FIRST, sum_total NULLS FIRST""")),

    "q_agg_grouping_sets" -> Q(
      t => t.lineitem
        .groupingSets(
          Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq.empty),
          col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("sum_qty"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("n"), col("sum_qty"))
        .orderBy(col("rf"), col("ls"), col("n"), col("sum_qty")),
      Some("""SELECT COALESCE(l_returnflag, 'ALL') AS rf, COALESCE(l_linestatus, 'ALL') AS ls,
                     COUNT(*) AS n, ROUND(SUM(l_quantity), 2) AS sum_qty
              FROM lineitem
              GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
              ORDER BY rf NULLS FIRST, ls NULLS FIRST, n NULLS FIRST, sum_qty NULLS FIRST""")),

    // Exact mode with a DETERMINISTIC tie-break — built-in mode() leaves
    // tie order unspecified on both engines (Spark picks an arbitrary
    // bucket, DuckDB the first seen), so the catalog states the mode
    // relationally: count per value, rank (count DESC, value ASC), keep
    // rank 1. Two partial-agg'd shuffles of |groups|·|distinct values|
    // keys — the grouped-count table is tiny at any corpus size, so the
    // window costs nothing. The same shape yields top-k frequent values
    // by raising the rank bound.
    "q_agg_mode" -> Q(
      t => {
        val cnt = t.lineitem
          .groupBy(col("l_returnflag"), col("l_quantity"))
          .agg(count(lit(1)).as("n"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("l_returnflag"))
          .orderBy(col("n").desc, col("l_quantity").asc)
        cnt.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("l_returnflag"), col("l_quantity").as("mode_qty"),
            col("n").as("n_mode"))
          .orderBy(col("l_returnflag"), col("mode_qty"), col("n_mode"))
      },
      Some("""WITH cnt AS (
              |  SELECT l_returnflag, l_quantity, COUNT(*) AS n
              |  FROM lineitem GROUP BY 1, 2
              |), r AS (
              |  SELECT l_returnflag, l_quantity, n,
              |         row_number() OVER (PARTITION BY l_returnflag
              |                            ORDER BY n DESC, l_quantity ASC) AS rn
              |  FROM cnt
              |)
              |SELECT l_returnflag, l_quantity AS mode_qty, n AS n_mode
              |FROM r WHERE rn = 1
              |ORDER BY l_returnflag NULLS FIRST, mode_qty NULLS FIRST,
              |         n_mode NULLS FIRST""".stripMargin)),

    // HLL sketch: engine-to-engine sketches differ by design → rows-only check
    // (tolerance covered by ApproxSpec against exact counts).
    "q_agg_approx_distinct" -> Q(
      t => t.lineitem
        .groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_orderkey")).as("approx_orders"))
        .orderBy(col("l_returnflag")),
      None))
}
