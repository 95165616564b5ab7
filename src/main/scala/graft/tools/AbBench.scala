package graft.tools
import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession
import graft.Tables
import graft.operators.AsOf

/** Scratch A/B harness for the current perf question (contents change per
  * round; this round: what does the native sort-merge as-of exec
  * (plans/AsOfJoin.scala — two exchanges in each side's own schema + a
  * one-pointer merge) buy over the composed union+window form
  * (operators/AsOf.nearestEarlier — one exchange of the UNION in the
  * widened schema + a running last(ignoreNulls) window)? Both forms run
  * the identical q_join_asof shape: every event against the tie-collapsed
  * purchase stream, noop-sink evaluated.
  *
  * r10 measurement (sf0.1, median of 3, local[32]): composed 0.656 s,
  * native 0.406 s — the native exec buys ~1.6× on this shape. Where it
  * comes from: the union widens every left row with null value slots
  * BEFORE its shuffle (wasted shuffle bytes) and the window evaluator
  * buffers frames per key, while the exec shuffles each side unwidened
  * and carries exactly one copied value row per partition. The composed
  * form remains the portable reference (no extension needed) and the
  * oracle-shaped twin; both are bit-identical by AsOfNativeSpec and both
  * sit under the DuckDB ASOF gate (q_join_asof / q_join_asof_native).
  *
  * Prior rounds' measurements live in git history (r10 Hilbert fusion:
  * composed 0.957 s vs native codegen kernel 0.384 s — the 2.5× that
  * moved the production paths to HilbertIndexExpression).
  */
object AbBench {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t = Tables(spark, sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    def run(name: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      mk.write.format("noop").mode("overwrite").save() // warm
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[ab] $name%-28s ${times.sorted.apply(1)}%.3f s (median of 3)")
    }

    def leftSide = t.events.select(col("event_id"), col("user_id"), col("ts"))
    def purchases = t.events
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("event_id"))

    run("asof-composed") {
      AsOf.nearestEarlier(leftSide, purchases,
        key = "user_id", leftTime = "ts", rightTime = "ts",
        valueCols = Seq("event_id"))
    }

    run("asof-native") {
      graft.plans.NativeAsOf.backward(leftSide, purchases,
        key = "user_id", leftTime = "ts", rightTime = "ts",
        valueCols = Seq("event_id"))
    }
    spark.stop()
  }
}
