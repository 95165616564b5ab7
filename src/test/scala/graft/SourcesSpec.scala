package graft

import org.apache.spark.sql.functions._

/** Source-format coverage (SURVEY.md §2C sources row): parquet is exercised
  * everywhere; here CSV and JSON lines round-trip the same rows, the rate
  * source ticks, and spark.range provides in-memory generation.
  */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("csv and json sources read back what parquet provided") {
    val base = Graft.table(spark, sf(), "nation")
    val dir = java.nio.file.Files.createTempDirectory("graft-src").toString
    base.write.mode("overwrite").option("header", "true").csv(s"$dir/csv")
    base.write.mode("overwrite").json(s"$dir/json")
    val fromCsv = spark.read.option("header", "true")
      .schema("n_nationkey int, n_name string, n_regionkey int").csv(s"$dir/csv")
    val fromJson = spark.read
      .schema("n_nationkey int, n_name string, n_regionkey int").json(s"$dir/json")
    val want = base.orderBy("n_nationkey").collect().toSeq
    assert(fromCsv.orderBy("n_nationkey").collect().toSeq == want)
    assert(fromJson.orderBy("n_nationkey").collect().toSeq == want)
  }

  test("xml source (built-in since Spark 4) round-trips the same rows") {
    val base = Graft.table(spark, sf(), "nation")
    val dir = java.nio.file.Files.createTempDirectory("graft-xml").toString
    base.write.mode("overwrite").option("rootTag", "nations")
      .option("rowTag", "nation").xml(s"$dir/xml")
    val fromXml = spark.read.option("rowTag", "nation")
      .schema("n_nationkey int, n_name string, n_regionkey int").xml(s"$dir/xml")
    assert(fromXml.orderBy("n_nationkey").collect().toSeq ==
      base.orderBy("n_nationkey").collect().toSeq)
  }

  test("rate source ticks monotonically") {
    val q = spark.readStream.format("rate").option("rowsPerSecond", "50").load()
      .writeStream.format("memory").queryName("rate_out").start()
    try {
      Thread.sleep(1500)
      q.processAllAvailable()
    } finally q.stop()
    val vals = spark.table("rate_out").select($"value").as[Long].collect().sorted.toSeq
    assert(vals.nonEmpty)
    assert(vals == (vals.min to vals.max))
  }

  test("in-memory range source feeds a plan") {
    val n = spark.range(0, 1000, 1, 4)
      .select(sum($"id")).as[Long].head()
    assert(n == 499500L)
  }
}
