package graft.tools
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, SparkSession}
import graft.Tables
object AbBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t = Tables(spark, "/root/testdata/sf0.1")
    def cents(c: Column) = sum(round(c * 100).cast("long")) / 100.0
    def dsum(c: Column) = sum(c.cast("decimal(22,6)")).cast("double")
    def fsum(c: Column) = // split-long exact sum for multi-dp doubles
      (sum(floor(c).cast("long")) + sum(round((c - floor(c)) * 1e6).cast("long")) / 1e6)
    def run(name: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      mk.write.format("noop").mode("overwrite").save() // warm
      val t0 = System.nanoTime()
      (1 to 3).foreach(_ => mk.write.format("noop").mode("overwrite").save())
      println(f"[ab] $name ${(System.nanoTime()-t0)/3e9}%.3f s")
    }
    val li = t.lineitem.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
    def full(s1: Column=>Column, s2: Column=>Column) =
      li.groupBy(col("l_returnflag"), col("l_linestatus")).agg(
        round(s1(col("l_quantity")), 2).as("sum_qty"),
        round(s1(col("l_extendedprice")), 2).as("sum_base_price"),
        round(s2(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(s2(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
        round(s1(col("l_quantity")) / count(col("l_quantity")), 2).as("avg_qty"),
        round(s1(col("l_extendedprice")) / count(col("l_extendedprice")), 2).as("avg_price"),
        round(s1(col("l_discount")) / count(col("l_discount")), 2).as("avg_disc"),
        count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    run("all-double")(full(c => sum(c), c => sum(c)))
    run("cents+decimal")(full(cents, dsum))
    run("cents+splitlong")(full(cents, fsum))
    spark.stop()
  }
}
