package graft.tools
import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession
import graft.Tables

/** Scratch A/B harness for the current perf question (contents change per
  * round; this round: q_sim_covariance's pair expansion — the struct-array
  * explode landed at 3.7 s in the headline bench, the slowest entry. How
  * much of that is the per-element STRUCT materialization, and does a flat
  * product array + posexplode (pair index recovered arithmetically from a
  * broadcast 2080-row map) buy it back?
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
    val t = Tables(spark, "/root/testdata/sf0.1")
    def run(name: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      mk.write.format("noop").mode("overwrite").save() // warm
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[ab] $name%-28s ${times.sorted.apply(1)}%.3f s (median of 3)")
    }

    val q = transform(graft.operators.Similarity.toDouble(col("embedding")),
      x => floor(x * 10000 + 0.5).cast("long"))

    // A: current catalog form — per-element (i, j, p) struct, explode, group
    run("struct-explode") {
      t.embeddings
        .select(explode(flatten(transform(q, (x, i) =>
          transform(slice(q, i + 1, size(q) - i), (y, j) =>
            struct(i.as("i"), (i + j).as("j"), (x * y).as("p")))))).as("e"))
        .select(col("e.i"), col("e.j"), col("e.p"))
        .groupBy(col("i"), col("j"))
        .agg(count(lit(1)).as("n_vec"), sum(col("p")).as("sxy"))
    }

    // B: flat product array + posexplode; (pos → i,j) recovered from a
    // broadcast arithmetic map, so the explode carries bare longs
    run("flat-posexplode") {
      val flat = flatten(transform(q, (x, i) =>
        transform(slice(q, i + 1, size(q) - i), y => x * y)))
      val sums = t.embeddings
        .select(posexplode(flat).as(Seq("pos", "p")))
        .groupBy(col("pos"))
        .agg(count(lit(1)).as("n_vec"), sum(col("p")).as("sxy"))
      val d = 64
      val posmap = spark.range(d).toDF("i")
        .join(spark.range(d).toDF("j"), col("j") >= col("i"))
        .select(col("i"), col("j"),
          (col("i") * d - col("i") * (col("i") - 1) / 2 + col("j") - col("i"))
            .as("pos"))
      sums.join(broadcast(posmap), "pos").select(col("i"), col("j"), col("n_vec"), col("sxy"))
    }

    // D: chained generators — posexplode the vector once (carrying the
    // array), then posexplode the tail slice per element: both explodes
    // and the product are codegen'd, no lambda interpretation, no join,
    // no corpus shuffle before the d²-group aggregate
    run("chained-explode") {
      t.embeddings
        .select(q.as("qa"), posexplode(q).as(Seq("i", "m")))
        .select(col("i"), col("m"),
          posexplode(slice(col("qa"), col("i") + 1, size(col("qa")) - col("i"))).as(Seq("dj", "m2")))
        .select(col("i"), (col("i") + col("dj")).as("j"), (col("m") * col("m2")).as("p"))
        .groupBy(col("i"), col("j"))
        .agg(count(lit(1)).as("n_vec"), sum(col("p")).as("sxy"))
    }

    // C: relational — explode to (vec_id, i, m), self-join per vector
    run("self-join") {
      val ex = t.embeddings
        .select(col("vec_id"), posexplode(q).as(Seq("i", "m")))
      ex.join(ex.select(col("vec_id").as("v2"), col("i").as("j"), col("m").as("m2")),
          col("vec_id") === col("v2") && col("i") <= col("j"))
        .groupBy(col("i"), col("j"))
        .agg(count(lit(1)).as("n_vec"), sum(col("m") * col("m2")).as("sxy"))
    }
    spark.stop()
  }
}
