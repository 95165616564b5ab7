package graft.queries

import org.apache.spark.sql.functions._

/** The nine TPC-H query shapes the catalog did not yet anchor (Q4, Q5, Q6,
  * Q9, Q12, Q13, Q14, Q16, Q20), adapted to the driver testdata the same way
  * the earlier anchors were (Joins.scala: Q2/Q7/Q8/Q15/Q17/Q18/Q19/Q21/Q22,
  * Analytics.scala: Q11, Relational.scala: Q1, q_join_star: Q3/Q10): no
  * partsupp table ships, so partsupp-backed shapes use lineitem as the
  * part↔supplier bridge, and missing columns (l_shipmode, l_commitdate,
  * o_comment) map to the closest shipped column with the same plan role.
  * With these, every one of the 22 TPC-H query SHAPES has an oracle-exact
  * catalog anchor — the shapes (not the spec numbers) are what exercise the
  * planner: semi-join decorrelation, same-nation pair joins, conditional
  * shares, distribution-of-counts, exclusion NOT IN, half-sum thresholds.
  *
  * Determinism follows the house rules (Catalog scaladoc): money math via
  * psum/cents, integral doubles summed exactly, one total ORDER BY, oracle
  * ORDER BY spelling NULLS FIRST.
  */
object TpchAnchors extends Catalog {

  def queries: Map[String, Q] = Map(

    // TPC-H Q4's shape — EXISTS-decorrelated priority count: a date-window
    // scan of orders semi-joined to lineitem on the order key PLUS a
    // non-equi "shipped late" predicate (l_shipdate > o_orderdate + 60
    // days; the spec's l_commitdate < l_receiptdate — not shipped — has
    // the same cross-table-inequality role). Catalyst plans the EXISTS as
    // a LeftSemi hash join on l_orderkey with the inequality as a
    // post-probe filter — exactly how it decorrelates the spec's EXISTS.
    // Scale shape: the date window prunes orders at the scan; the semi
    // join shuffles both sides on the order key once (semi output ≤ left
    // side, no fan-out); the final groupBy is 5 groups, partial-agg'd
    // map-side. All outputs integral.
    "q_join_order_priority" -> Q(
      t => {
        val ord = t.orders
          .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1997-04-01").cast("timestamp"))
          .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        val ship = t.lineitem.select(col("l_orderkey"), col("l_shipdate"))
        ord.join(ship,
            col("o_orderkey") === col("l_orderkey") &&
              col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
            "left_semi")
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("order_count"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""SELECT o_orderpriority, COUNT(*) AS order_count
              |FROM orders
              |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
              |  AND o_orderdate <  TIMESTAMP '1997-04-01'
              |  AND EXISTS (
              |    SELECT 1 FROM lineitem
              |    WHERE l_orderkey = o_orderkey
              |      AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
              |GROUP BY 1
              |ORDER BY o_orderpriority NULLS FIRST""".stripMargin)),

    // TPC-H Q5's shape — local supplier volume: revenue per nation where
    // the CUSTOMER and the SUPPLIER sit in the same nation of one region.
    // The same-nation constraint is an equi-join between two different
    // dimension paths into the fact (c_nationkey = s_nationkey) — the
    // planner must carry both nation keys to the fact row before it can
    // apply it. Scale shape: region→nation→supplier is a broadcast chain;
    // the date-pruned orders↔lineitem join is the one fact-fact shuffle;
    // customer joins co-keyed on o_custkey; the same-nation equality is a
    // post-join filter on two already-local ints. Revenue psum-exact.
    "q_join_local_volume" -> Q(
      t => {
        val asiaNations = t.nation
          .join(broadcast(t.region.filter(col("r_name") === "ASIA")
            .select(col("r_regionkey"))),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey"), col("n_name"))
        val supp = t.supplier
          .join(broadcast(asiaNations),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("s_nationkey"), col("n_name"))
        t.lineitem
          .select(col("l_orderkey"), col("l_suppkey"),
            (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("volume"))
          .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
          .join(t.orders
            .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
            .select(col("o_orderkey"), col("o_custkey")),
            col("l_orderkey") === col("o_orderkey"))
          .join(t.customer.select(col("c_custkey"), col("c_nationkey")),
            col("o_custkey") === col("c_custkey"))
          .filter(col("c_nationkey") === col("s_nationkey"))
          .groupBy(col("n_name"))
          .agg(round(psum(col("volume")), 2).as("revenue"))
          .orderBy(col("n_name"))
      },
      Some("""SELECT n_name,
              |       ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,6))) AS DOUBLE), 2) AS revenue
              |FROM lineitem
              |JOIN supplier ON l_suppkey = s_suppkey
              |JOIN orders   ON l_orderkey = o_orderkey
              |JOIN customer ON o_custkey = c_custkey
              |JOIN nation   ON s_nationkey = n_nationkey
              |JOIN region   ON n_regionkey = r_regionkey
              |WHERE r_name = 'ASIA'
              |  AND c_nationkey = s_nationkey
              |  AND o_orderdate >= TIMESTAMP '1996-01-01'
              |  AND o_orderdate <  TIMESTAMP '1997-01-01'
              |GROUP BY 1
              |ORDER BY n_name NULLS FIRST""".stripMargin)),

    // TPC-H Q6's shape — forecasting revenue change: a single scan-level
    // conjunctive filter (date window + discount band + quantity cap) and
    // one global SUM(price·discount), no joins at all. The anchor's value
    // is the PLAN: every predicate must reach the parquet scan
    // (PushedFilters) and the aggregate is one map-side partial + one
    // 1-row exchange. The discount band compares exact integral cents
    // (floor(d·100 + 0.5) ∈ [5,7]) instead of raw double literals, so no
    // stored value sits on a comparison boundary. price·discount is
    // 2dp·2dp = exactly 4dp → psum-exact.
    "q_agg_revenue_delta" -> Q(
      t => {
        t.lineitem
          .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
            floor(col("l_discount") * 100 + 0.5).between(5, 7) &&
            col("l_quantity") < 24)
          .agg(round(psum(col("l_extendedprice") * col("l_discount")), 2)
            .as("revenue"),
            count(lit(1)).as("n_lines"))
      },
      Some("""SELECT ROUND(CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(22,6))) AS DOUBLE), 2) AS revenue,
              |       COUNT(*) AS n_lines
              |FROM lineitem
              |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              |  AND l_shipdate <  TIMESTAMP '1997-01-01'
              |  AND CAST(floor(l_discount * 100 + 0.5) AS BIGINT) BETWEEN 5 AND 7
              |  AND l_quantity < 24""".stripMargin)),

    // TPC-H Q9's shape — product-type profit by nation and year: a
    // part-name filter picks a product line, and profit per fact row nets
    // revenue against a cost term from the part dim (the spec's
    // ps_supplycost·quantity; p_retailprice·quantity/10 plays the same
    // role — a dim-priced cost scaled by the fact quantity). Grouped by
    // the SUPPLIER's nation and the order year, so the plan must carry
    // both dim attributes and the orders date to the fact row. Scale
    // shape: part (name filter) and supplier→nation broadcast; the one
    // fact-fact shuffle is lineitem↔orders on the order key. The amount
    // is exactly 4dp (revenue 4dp, cost 3dp) → psum-exact.
    "q_join_product_profit" -> Q(
      t => {
        val redParts = t.part.filter(col("p_name").like("%red%"))
          .select(col("p_partkey"), col("p_retailprice"))
        val suppNat = t.supplier
          .join(broadcast(t.nation.select(col("n_nationkey"), col("n_name"))),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("n_name").as("nation"))
        t.lineitem
          .join(broadcast(redParts), col("l_partkey") === col("p_partkey"))
          .join(broadcast(suppNat), col("l_suppkey") === col("s_suppkey"))
          .select(col("l_orderkey"), col("nation"),
            (col("l_extendedprice") * (lit(1) - col("l_discount")) -
              col("p_retailprice") * col("l_quantity") / 10).as("amount"))
          .join(t.orders.select(col("o_orderkey"),
              year(col("o_orderdate")).as("o_year")),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("nation"), col("o_year"))
          .agg(round(psum(col("amount")), 2).as("profit"))
          .orderBy(col("nation"), col("o_year").desc)
      },
      Some("""SELECT n_name AS nation,
              |       CAST(year(o_orderdate) AS INTEGER) AS o_year,
              |       ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
              |         - p_retailprice * l_quantity / 10 AS DECIMAL(22,6))) AS DOUBLE), 2) AS profit
              |FROM lineitem
              |JOIN part     ON l_partkey = p_partkey
              |JOIN supplier ON l_suppkey = s_suppkey
              |JOIN nation   ON s_nationkey = n_nationkey
              |JOIN orders   ON l_orderkey = o_orderkey
              |WHERE p_name LIKE '%red%'
              |GROUP BY 1, 2
              |ORDER BY nation NULLS FIRST, o_year DESC NULLS LAST""".stripMargin)),

    // TPC-H Q12's shape — shipping-mode priority split: one fact↔fact
    // join (orders↔lineitem), a date window on the lineitem side, then
    // per-group CONDITIONAL counts splitting a dim attribute into
    // critical vs non-critical classes (the spec's l_shipmode grouping
    // maps to l_linestatus — the shipped column with the same
    // low-cardinality fact-side role). The CASE lives inside the
    // aggregates so one pass computes both tallies. Scale shape: date
    // filter prunes lineitem at the scan; one shuffle on the order key;
    // 2-group final agg. All outputs integral.
    "q_join_shipmode_priority" -> Q(
      t => {
        val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        t.lineitem
          .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
          .select(col("l_orderkey"), col("l_linestatus"))
          .join(t.orders.select(col("o_orderkey"), col("o_orderpriority")),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("l_linestatus"))
          .agg(sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
            sum(when(!high, 1L).otherwise(0L)).as("low_line_count"))
          .orderBy(col("l_linestatus"))
      },
      Some("""SELECT l_linestatus,
              |       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
              |                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
              |       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
              |                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
              |FROM lineitem
              |JOIN orders ON l_orderkey = o_orderkey
              |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              |  AND l_shipdate <  TIMESTAMP '1997-01-01'
              |GROUP BY 1
              |ORDER BY l_linestatus NULLS FIRST""".stripMargin)),

    // TPC-H Q13's shape — customer order-count distribution: a LEFT OUTER
    // join whose filter lives IN THE JOIN CONDITION (not WHERE — pushing
    // it to WHERE would drop the zero-order customers the query exists to
    // count), then two stacked aggregations: orders per customer, then
    // customers per order-count. The spec's o_comment NOT LIKE filter
    // maps to o_orderstatus <> 'F' — same role, a join-side-only
    // predicate. Scale shape: the outer join shuffles both sides on the
    // customer key; the first agg reuses that clustering (no second
    // shuffle of fact size); the distribution agg exchanges ≤ |distinct
    // counts| rows. All integral.
    "q_join_order_count_dist" -> Q(
      t => {
        val perCust = t.customer.select(col("c_custkey"))
          .join(t.orders
              .filter(col("o_orderstatus") =!= "F")
              .select(col("o_orderkey"), col("o_custkey")),
            col("c_custkey") === col("o_custkey"), "left")
          .groupBy(col("c_custkey"))
          .agg(count(col("o_orderkey")).as("c_count"))
        perCust
          .groupBy(col("c_count"))
          .agg(count(lit(1)).as("custdist"))
          .orderBy(col("custdist").desc, col("c_count").desc)
      },
      Some("""WITH per_cust AS (
              |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
              |  FROM customer
              |  LEFT JOIN orders ON c_custkey = o_custkey AND o_orderstatus <> 'F'
              |  GROUP BY 1
              |)
              |SELECT c_count, COUNT(*) AS custdist
              |FROM per_cust
              |GROUP BY 1
              |ORDER BY custdist DESC NULLS LAST, c_count DESC NULLS LAST""".stripMargin)),

    // TPC-H Q14's shape — promotion revenue share: one month of lineitem
    // joined to part, output is a SINGLE ROW whose value is a ratio of a
    // conditional sum to the total sum over the same join. Both operands
    // are decimal-exact before the one double multiply + divide (fixed
    // IEEE op order → bit-identical on both engines), then rounded once.
    // Scale shape: part is a broadcast dim (only p_partkey + p_type
    // read); the date window prunes the fact scan; the global agg is one
    // map-side partial + a 1-row exchange.
    "q_agg_promo_share" -> Q(
      t => {
        t.lineitem
          .filter(col("l_shipdate") >= lit("1996-03-01").cast("timestamp") &&
            col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
          .select(col("l_partkey"),
            (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("volume"))
          .join(broadcast(t.part.select(col("p_partkey"), col("p_type"))),
            col("l_partkey") === col("p_partkey"))
          .agg(round(
            lit(100.0) * psum(when(col("p_type") === "PROMO", col("volume"))
              .otherwise(lit(0))) / psum(col("volume")), 6).as("promo_share"))
      },
      Some("""SELECT ROUND(
              |         100.0 * CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'
              |                         THEN l_extendedprice * (1 - l_discount)
              |                         ELSE 0 END AS DECIMAL(22,6))) AS DOUBLE)
              |         / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,6))) AS DOUBLE),
              |         6) AS promo_share
              |FROM lineitem
              |JOIN part ON l_partkey = p_partkey
              |WHERE l_shipdate >= TIMESTAMP '1996-03-01'
              |  AND l_shipdate <  TIMESTAMP '1996-04-01'""".stripMargin)),

    // TPC-H Q16's shape — supplier count per part attribute, with an
    // exclusion list: COUNT(DISTINCT supplier) per (brand, size) over the
    // part↔supplier bridge (lineitem here; partsupp in the spec), minus
    // suppliers matching a blacklist subquery (s_acctbal < 0 plays the
    // spec's "customer complaints" comment filter). The NOT IN side has
    // no NULLs (key column), so Catalyst plans a plain LeftAnti — the
    // anchor pins the exclusion-before-distinct ordering: a supplier on
    // the blacklist must not count even where it has qualifying rows.
    // Scale shape: part filter broadcast; blacklist broadcast anti join
    // (6 rows); COUNT DISTINCT expands to a two-level agg on
    // (brand, size, suppkey) then (brand, size) — both partial-agg'd.
    "q_join_supplier_cnt" -> Q(
      t => {
        val sizes = Seq(1, 5, 9, 13, 17, 21, 25, 29)
        val parts = t.part
          .filter(col("p_type") =!= "PROMO" && col("p_size").isin(sizes: _*))
          .select(col("p_partkey"), col("p_brand"), col("p_size"))
        val blacklist = t.supplier.filter(col("s_acctbal") < 0)
          .select(col("s_suppkey"))
        t.lineitem.select(col("l_partkey"), col("l_suppkey"))
          .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
          .join(broadcast(blacklist), col("l_suppkey") === col("s_suppkey"),
            "left_anti")
          .groupBy(col("p_brand"), col("p_size"))
          .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
          .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_size"))
      },
      Some("""SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
              |FROM lineitem
              |JOIN part ON l_partkey = p_partkey
              |WHERE p_type <> 'PROMO'
              |  AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
              |  AND l_suppkey NOT IN (
              |    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
              |GROUP BY 1, 2
              |ORDER BY supplier_cnt DESC NULLS LAST, p_brand NULLS FIRST,
              |         p_size NULLS FIRST""".stripMargin)),

    // TPC-H Q20's shape — half-sum threshold promotion: suppliers whose
    // shipped quantity of a filtered product line exceeds a fraction of
    // that part's total shipped quantity (the spec's ps_availqty >
    // 0.5·SUM(l_quantity), restated on the lineitem bridge), surfaced as
    // an IN-subquery semi join against the supplier dim. The threshold
    // compares qty·10 > total·3 — all integral doubles, no float literal,
    // no boundary to disagree on. Scale shape: the per-(part, supplier)
    // agg and the per-part rollup reuse one clustering (second agg is a
    // narrow re-agg of the first's output); the qualifying pairs are tiny
    // and broadcast into the supplier semi join — the dim never shuffles.
    "q_join_dominant_supplier" -> Q(
      t => {
        val shipped = t.lineitem
          .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
          .join(broadcast(t.part.filter(col("p_name").like("hot%"))
            .select(col("p_partkey"))),
            col("l_partkey") === col("p_partkey"))
          .groupBy(col("l_partkey"), col("l_suppkey"))
          .agg(sum(col("l_quantity")).as("qty"))
        val total = shipped.groupBy(col("l_partkey").as("pk"))
          .agg(sum(col("qty")).as("total_qty"))
        val dominant = shipped
          .join(total, col("l_partkey") === col("pk"))
          .filter(col("qty") * 10 > col("total_qty") * 3)
          .select(col("l_suppkey")).distinct()
        t.supplier
          .join(broadcast(dominant), col("s_suppkey") === col("l_suppkey"),
            "left_semi")
          .select(col("s_suppkey"), col("s_name"))
          .orderBy(col("s_suppkey"))
      },
      Some("""WITH shipped AS (
              |  SELECT l_partkey, l_suppkey, SUM(l_quantity) AS qty
              |  FROM lineitem
              |  JOIN part ON l_partkey = p_partkey AND p_name LIKE 'hot%'
              |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              |    AND l_shipdate <  TIMESTAMP '1997-01-01'
              |  GROUP BY 1, 2
              |), total AS (
              |  SELECT l_partkey AS pk, SUM(qty) AS total_qty
              |  FROM shipped GROUP BY 1
              |)
              |SELECT s_suppkey, s_name
              |FROM supplier
              |WHERE s_suppkey IN (
              |  SELECT l_suppkey FROM shipped JOIN total ON l_partkey = pk
              |  WHERE qty * 10 > total_qty * 3)
              |ORDER BY s_suppkey NULLS FIRST""".stripMargin)))
}
