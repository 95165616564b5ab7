package graft

import graft.queries.AllQueries
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Representative of the engine: fact-fact shuffle join, broadcast dims,
    * partial+final aggregation, window ranking — the plan shape we optimize
    * for at 100 TB (dims broadcast, one shuffle on the fact keys).
    */
  def entry(spark: SparkSession): DataFrame = {
    val t = Tables(spark, "/root/testdata/sf0.001")
    val revenue = t.lineitem
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .join(t.customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), year(col("o_orderdate")).as("order_year"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
    val w = Window.partitionBy(col("r_name")).orderBy(col("revenue").desc)
    revenue
      .withColumn("rank_in_region", row_number().over(w))
      .filter(col("rank_in_region") <= 3)
      .orderBy(col("r_name"), col("rank_in_region"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    AllQueries.all.map { case (name, q) =>
      name -> ((spark: SparkSession, sfDir: String) => q.run(Tables(spark, sfDir)))
    }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    AllQueries.all.collect { case (name, q) if q.oracle.isDefined => name -> q.oracle.get }
}
