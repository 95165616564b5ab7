package graft.tools

import graft.{Bench, Tables}
import graft.queries.AllQueries
import org.apache.spark.sql.SparkSession

/** Driver-phase attribution for catalog queries (r18 optimization round):
  * splits one noop-sink run of a query into construction (run(tables) —
  * scan setup, schema resolution), Catalyst phases (QueryExecution's
  * tracker: analysis / optimization / planning), and execution (the noop
  * write, which includes AQE replanning and all jobs). The bench's wall
  * clock is construction + phases + execution; when job time (DAGScheduler
  * log) is far below the wall, this says which driver phase eats the gap.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.PhaseProbe q_a,q_b"
  */
object PhaseProbe {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val names = args.headOption
      .map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
      .getOrElse(Seq("q_join_inner"))
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    // diagnostic-only conf overrides: "k=v;k2=v2" (A/B a setting without
    // touching the engine defaults under test)
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach(_.split(";").foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      builder.config(k.trim, v.trim)
    })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel(sys.env.getOrElse("SPARK_GRAFT_LOG", "ERROR"))
    val tables = Tables(spark, sfDir)
    def onceDetailed(name: String): String = {
      val t0 = System.nanoTime()
      val df = AllQueries.all(name).run(tables)
      val t1 = System.nanoTime()
      df.queryExecution.optimizedPlan // force analysis + optimization
      val t2 = System.nanoTime()
      df.queryExecution.executedPlan // force physical planning
      val t3 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t4 = System.nanoTime()
      // diagnostic alternative action: materialize every row through the
      // ALREADY-PLANNED query execution (no new write command, no second
      // Catalyst pass) — isolates the noop-write machinery's own cost
      val n = df.queryExecution.toRdd.mapPartitions(
        it => Iterator.single(it.size.toLong)).collect().sum
      val t5 = System.nanoTime()
      f"construct=${(t1 - t0) / 1e9}%.3f opt=${(t2 - t1) / 1e9}%.3f " +
        f"plan=${(t3 - t2) / 1e9}%.3f exec=${(t4 - t3) / 1e9}%.3f " +
        f"rddPass=${(t5 - t4) / 1e9}%.3f (rows=$n)"
    }
    names.foreach { name =>
      onceDetailed(name) // warm
      Bench.quiesce(spark)
      System.gc()
      (1 to 3).foreach { i =>
        println(f"[phase] $name%-24s run$i ${onceDetailed(name)}")
      }
    }
    spark.stop()
  }
}
