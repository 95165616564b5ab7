package graft.queries

import org.apache.spark.sql.functions._

/** Set operations + exact deduplication (SURVEY.md §2C set-ops row).
  * `q_dedup_keep_first` is the deterministic form of dropDuplicates — keep
  * the lowest event_id per key — which is also the shape that scales: a
  * single hash aggregation on the dedup key, no sort of the full table.
  */
object SetOps extends Catalog {

  def queries: Map[String, Q] = Map(
    "q_set_union_all" -> Q(
      t => t.orders.filter(col("o_totalprice") > 350000)
        .select(col("o_orderkey").as("k"), lit("orders").as("src"))
        .unionAll(t.lineitem.filter(col("l_quantity") > 49)
          .select(col("l_orderkey").as("k"), lit("lineitem").as("src")))
        .orderBy(col("k"), col("src")),
      Some("""SELECT o_orderkey AS k, 'orders' AS src FROM orders WHERE o_totalprice > 350000
              UNION ALL
              SELECT l_orderkey AS k, 'lineitem' AS src FROM lineitem WHERE l_quantity > 49
              ORDER BY k NULLS FIRST, src NULLS FIRST""")),

    "q_set_union_distinct" -> Q(
      t => t.orders.filter(col("o_totalprice") > 350000).select(col("o_orderkey").as("k"))
        .union(t.lineitem.filter(col("l_quantity") > 49).select(col("l_orderkey").as("k")))
        .distinct()
        .orderBy(col("k")),
      Some("""SELECT o_orderkey AS k FROM orders WHERE o_totalprice > 350000
              UNION
              SELECT l_orderkey AS k FROM lineitem WHERE l_quantity > 49
              ORDER BY k NULLS FIRST""")),

    "q_set_intersect" -> Q(
      t => t.orders.filter(col("o_orderstatus") === "F").select(col("o_orderkey").as("k"))
        .intersect(t.lineitem.filter(col("l_returnflag") === "R").select(col("l_orderkey").as("k")))
        .orderBy(col("k")),
      Some("""SELECT o_orderkey AS k FROM orders WHERE o_orderstatus = 'F'
              INTERSECT
              SELECT l_orderkey AS k FROM lineitem WHERE l_returnflag = 'R'
              ORDER BY k NULLS FIRST""")),

    "q_set_except" -> Q(
      t => t.orders.select(col("o_orderkey").as("k"))
        .except(t.lineitem.filter(col("l_returnflag") === "R").select(col("l_orderkey").as("k")))
        .orderBy(col("k")),
      Some("""SELECT o_orderkey AS k FROM orders
              EXCEPT
              SELECT l_orderkey AS k FROM lineitem WHERE l_returnflag = 'R'
              ORDER BY k NULLS FIRST""")),

    "q_set_distinct" -> Q(
      t => t.events.select(col("user_id"), col("event_type")).distinct()
        .orderBy(col("user_id"), col("event_type")),
      Some("""SELECT DISTINCT user_id, event_type FROM events
              ORDER BY user_id NULLS FIRST, event_type NULLS FIRST""")),

    "q_dedup_keep_first" -> Q(
      t => t.events
        .groupBy(col("user_id"), col("event_type"))
        .agg(min(col("event_id")).as("first_event_id"), count(lit(1)).as("n_dupes"))
        .orderBy(col("user_id"), col("event_type"), col("first_event_id"), col("n_dupes")),
      Some("""SELECT user_id, event_type, MIN(event_id) AS first_event_id, COUNT(*) AS n_dupes
              FROM events GROUP BY user_id, event_type
              ORDER BY user_id NULLS FIRST, event_type NULLS FIRST,
                       first_event_id NULLS FIRST, n_dupes NULLS FIRST""")))
}
