package graft.tools

import graft.{ScaleProbe, Tables}
import graft.queries.AllQueries
import org.apache.spark.sql.SparkSession

/** Scratch diagnostic: repeat the bench scale probe N times in one JVM to
  * separate plan-shape regressions from run-to-run variance (VERDICT r5
  * flagged q_dedup_lsh_pairs ratio 13.67 vs 6.66 on unchanged code).
  * First replays the main-bench LSH runs so the CacheManager state matches
  * a real bench run, then probes repeatedly.
  */
object ProbeCheck {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tables = Tables(spark, sfDir)
    // replicate the main bench's 4 runs of the LSH query (warm + 3 timed)
    (1 to 4).foreach { _ =>
      AllQueries.all("q_dedup_lsh_pairs").run(tables)
        .write.format("noop").mode("overwrite").save()
    }
    (1 to reps).foreach { i =>
      val out = ScaleProbe.run(spark, sfDir, 10)
      out.foreach { p =>
        println(f"[probe $i] ${p.name} t1=${p.t1}%.3f tN=${p.tN}%.3f " +
          f"ratio=${p.ratio}%.2f runs1=${p.runs1.map(x => f"$x%.2f")} " +
          f"runsN=${p.runsN.map(x => f"$x%.2f")}")
      }
    }
    spark.stop()
  }
}
