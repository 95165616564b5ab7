package graft.tools
import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession
import graft.Tables
import graft.operators.Layout

/** Scratch A/B harness for the current perf question (contents change per
  * round; this round: the Hilbert curve value over the full lineitem grid —
  * how much does the fused codegen kernel (HilbertIndexExpression, one
  * generated loop per row) buy over the composed five-projection-stage
  * chain (Layout.hilbertIndex), and where does Morton (zValue, a flat
  * 10-term add chain) sit as the reference point? All three forms run the
  * identical grid-normalize → curve → cell-envelope aggregate so only the
  * curve arithmetic differs.
  *
  * r10 measurement (sf0.1, median of 3, local[32]): composed **0.957 s**,
  * native **0.384 s**, morton 0.301 s — the fusion buys 2.5×. The composed
  * chain's five stages each re-branch through wide when/mask CASE trees
  * (CollapseProject keeps the non-cheap aliases as separate projections,
  * so the row pays five materialization hops), while the kernel is one
  * generated loop a row never leaves. Consequence: the catalog's headline
  * and production paths (q_layout_pruning, the bench entry) use the
  * native form; the composed form stays as the oracle-shaped reference
  * and parity anchor (LayoutSpec proves them bit-identical).
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

    def grid = {
      val g0 = t.lineitem.select(
        col("l_partkey").cast("long").as("p"),
        col("l_suppkey").cast("long").as("s"))
      val mm = g0.agg(max(col("p")).as("pm"), max(col("s")).as("sm"))
      g0.crossJoin(broadcast(mm))
        .select(expr("p * 32 div (pm + 1)").as("pg"),
          expr("s * 32 div (sm + 1)").as("sg"))
    }

    def envelope(cells: org.apache.spark.sql.DataFrame) =
      cells.groupBy(col("cell"))
        .agg(count(lit(1)).as("n"),
          min(col("pg")).as("pg_min"), max(col("pg")).as("pg_max"),
          min(col("sg")).as("sg_min"), max(col("sg")).as("sg_max"))

    run("hilbert-composed") {
      envelope(Layout.hilbertIndex(grid, "pg", "sg", order = 5)
        .select(col("pg"), col("sg"), shiftright(col("h"), 5).as("cell")))
    }

    run("hilbert-native") {
      envelope(grid.select(col("pg"), col("sg"),
        shiftright(graft.functions.HilbertIndexExpression
          .column(col("pg"), col("sg"), order = 5), 5).as("cell")))
    }

    run("morton") {
      envelope(grid.select(col("pg"), col("sg"),
        shiftright(Layout.zValue(col("pg"), col("sg"), 5), 5).as("cell")))
    }
    spark.stop()
  }
}
