package graft.queries

import graft.functions.IsoMicrosTrimExpression
import graft.operators.{ScoredTag, TopKAggregator}
import org.apache.spark.sql.functions._

/** Extended declared surface: native codegen Expression, typed UDAF,
  * scalar UDF, min_by/max_by, multiset set-ops (SURVEY.md §2C UDF row +
  * set-ops row stragglers).
  */
object Extended extends Catalog {

  def queries: Map[String, Q] = Map(
    // Same oracle as q_pipe_iso_trim, computed by the NATIVE codegen'd
    // Catalyst expression instead of the composed built-ins — proves the
    // custom Expression path end-to-end under the DuckDB gate.
    "q_pipe_iso_trim_native" -> Q(
      t => t.events
        .select(
          col("event_id"),
          IsoMicrosTrimExpression.column(unix_micros(col("ts"))).as("iso"))
        .orderBy(col("event_id"), col("iso")),
      Some("""SELECT event_id,
                     regexp_replace(strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%dT%H:%M:%S.%g'),
                                    '\.?0+$', '') || 'Z' AS iso
              FROM events
              ORDER BY event_id NULLS FIRST, iso NULLS FIRST""")),

    // Typed Aggregator top-k: bounded k-element buffers with map-side
    // combine (vs the window form's full per-group sort). Oracle: the
    // window formulation — both must agree exactly.
    "q_udaf_topk" -> Q(
      t => {
        val topk = udaf(new TopKAggregator(3), org.apache.spark.sql.Encoders.product[ScoredTag])
        t.orders
          .join(t.customer, col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_mktsegment"))
          .agg(topk(col("o_totalprice"), col("o_orderkey")).as("top"))
          .select(col("c_mktsegment"), posexplode(col("top")).as(Seq("pos", "st")))
          .select(
            col("c_mktsegment"),
            (col("pos") + 1).cast("int").as("rank"),
            col("st.tag").as("o_orderkey"),
            round(col("st.score"), 2).as("total"))
          .orderBy(col("c_mktsegment"), col("rank"), col("o_orderkey"), col("total"))
      },
      Some("""SELECT c_mktsegment, CAST(rn AS INTEGER) AS rank, o_orderkey,
                     ROUND(o_totalprice, 2) AS total
              FROM (SELECT c_mktsegment, o_orderkey, o_totalprice,
                           row_number() OVER (PARTITION BY c_mktsegment
                                              ORDER BY o_totalprice DESC, o_orderkey) AS rn
                    FROM orders JOIN customer ON o_custkey = c_custkey)
              WHERE rn <= 3
              ORDER BY c_mktsegment NULLS FIRST, rank NULLS FIRST,
                       o_orderkey NULLS FIRST, total NULLS FIRST""")),

    // Scalar Scala UDF (declared surface; codegen fallback accepted —
    // everything else in the engine avoids UDFs).
    "q_udf_scalar" -> Q(
      t => {
        val bucketLabel = udf((v: Double) =>
          if (v >= 400000) "platinum" else if (v >= 200000) "gold" else "standard")
        t.orders
          .groupBy(bucketLabel(col("o_totalprice")).as("tier"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("tier"), col("n"))
      },
      Some("""SELECT CASE WHEN o_totalprice >= 400000 THEN 'platinum'
                          WHEN o_totalprice >= 200000 THEN 'gold'
                          ELSE 'standard' END AS tier,
                     COUNT(*) AS n
              FROM orders GROUP BY 1
              ORDER BY tier NULLS FIRST, n NULLS FIRST""")),

    "q_agg_argminmax" -> Q(
      t => t.events
        .groupBy(col("event_type"))
        .agg(
          max_by(col("event_id"), col("ts")).as("latest_event"),
          min_by(col("event_id"), col("ts")).as("earliest_event"),
          date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("last_ts"))
        .orderBy(col("event_type"), col("latest_event"), col("earliest_event"), col("last_ts")),
      Some("""SELECT event_type,
                     arg_max(event_id, ts) AS latest_event,
                     arg_min(event_id, ts) AS earliest_event,
                     strftime(CAST(max(ts) AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS last_ts
              FROM events GROUP BY event_type
              ORDER BY event_type NULLS FIRST, latest_event NULLS FIRST,
                       earliest_event NULLS FIRST, last_ts NULLS FIRST""")),

    "q_set_intersect_all" -> Q(
      t => t.lineitem.filter(col("l_returnflag") === "R").select(col("l_orderkey").as("k"))
        .intersectAll(t.lineitem.filter(col("l_linestatus") === "F").select(col("l_orderkey").as("k")))
        .groupBy(col("k")).agg(count(lit(1)).as("multiplicity"))
        .orderBy(col("k"), col("multiplicity")),
      Some("""SELECT k, COUNT(*) AS multiplicity FROM (
                SELECT l_orderkey AS k FROM lineitem WHERE l_returnflag = 'R'
                INTERSECT ALL
                SELECT l_orderkey AS k FROM lineitem WHERE l_linestatus = 'F')
              GROUP BY k
              ORDER BY k NULLS FIRST, multiplicity NULLS FIRST""")),

    "q_set_except_all" -> Q(
      t => t.lineitem.select(col("l_orderkey").as("k"))
        .exceptAll(t.lineitem.filter(col("l_returnflag") === "R").select(col("l_orderkey").as("k")))
        .groupBy(col("k")).agg(count(lit(1)).as("multiplicity"))
        .orderBy(col("k"), col("multiplicity")),
      Some("""SELECT k, COUNT(*) AS multiplicity FROM (
                SELECT l_orderkey AS k FROM lineitem
                EXCEPT ALL
                SELECT l_orderkey AS k FROM lineitem WHERE l_returnflag = 'R')
              GROUP BY k
              ORDER BY k NULLS FIRST, multiplicity NULLS FIRST""")))
}
