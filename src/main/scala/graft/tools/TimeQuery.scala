package graft.tools

import graft.{Bench, Tables}
import graft.queries.AllQueries
import org.apache.spark.sql.SparkSession

/** Time individual catalog queries under the HEADLINE estimator (warmup,
  * quiesce + GC, 5 timed noop-sink runs, median) without paying for the
  * full bench: `runMain graft.tools.TimeQuery q_dedup_cc[,q_x,...]`.
  * Data dir from SPARK_GRAFT_SF_DIR (default sf0.1). The local-iteration
  * companion to Bench — same session confs, same estimator, so numbers
  * line up with BENCH_r{N} headline entries.
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val names = args.headOption
      .map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
      .getOrElse(Seq("q_scan_project"))
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel(sys.env.getOrElse("SPARK_GRAFT_LOG", "ERROR"))
    val tables = Tables(spark, sfDir)
    def once(name: String): Double = {
      val t0 = System.nanoTime()
      AllQueries.all(name).run(tables)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    names.foreach { name =>
      once(name) // warm
      Bench.quiesce(spark)
      System.gc()
      val runs = Seq.fill(5)(once(name)).sorted
      println(f"[time] $name%-28s ${runs(2)}%.3f s (runs: ${runs.map(r => f"$r%.3f").mkString(", ")})")
    }
    spark.stop()
  }
}
