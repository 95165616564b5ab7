package graft.queries

import org.apache.spark.sql.functions._

/** Pivot and statistical aggregates — the remaining common OLAP surface. */
object Analytics extends Catalog {

  def queries: Map[String, Q] = Map(
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

    "q_agg_statistical" -> Q(
      t => t.lineitem
        .groupBy(col("l_returnflag"))
        .agg(
          round(stddev_samp(col("l_extendedprice")), 2).as("sd_price"),
          round(stddev_pop(col("l_extendedprice")), 2).as("sdp_price"),
          round(var_samp(col("l_quantity")), 2).as("var_qty"),
          round(var_pop(col("l_quantity")), 2).as("varp_qty"),
          round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qp"),
          round(covar_samp(col("l_quantity"), col("l_extendedprice")), 2).as("cov_qp"),
          round(expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY l_extendedprice)"), 2)
            .as("median_price"))
        .orderBy(col("l_returnflag"), col("sd_price"), col("sdp_price"), col("var_qty"),
          col("varp_qty"), col("corr_qp"), col("cov_qp"), col("median_price")),
      Some("""SELECT l_returnflag,
                     ROUND(stddev_samp(l_extendedprice), 2) AS sd_price,
                     ROUND(stddev_pop(l_extendedprice), 2) AS sdp_price,
                     ROUND(var_samp(l_quantity), 2) AS var_qty,
                     ROUND(var_pop(l_quantity), 2) AS varp_qty,
                     ROUND(corr(l_quantity, l_extendedprice), 4) AS corr_qp,
                     ROUND(covar_samp(l_quantity, l_extendedprice), 2) AS cov_qp,
                     ROUND(quantile_cont(l_extendedprice, 0.5), 2) AS median_price
              FROM lineitem
              GROUP BY l_returnflag
              ORDER BY l_returnflag NULLS FIRST, sd_price NULLS FIRST, sdp_price NULLS FIRST,
                       var_qty NULLS FIRST, varp_qty NULLS FIRST, corr_qp NULLS FIRST,
                       cov_qp NULLS FIRST, median_price NULLS FIRST""")))
}
