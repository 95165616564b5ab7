package graft.tools

import graft.Bench
import org.apache.spark.sql.SparkSession

/** Diagnostic for the calib legs' WITHIN-JVM trajectory (r14 seal
  * investigation): runs the scan/spin/shuffle calibration kernels N times
  * in one fresh JVM, printing each sample, to separate two explanations
  * for an inflated PRE-headline scan bracket:
  *
  *  - cold-JVM warm-up: a fresh process converges from ~0.26 s down to
  *    the warm ~0.15 s floor over the first handful of scans regardless
  *    of co-tenancy (JIT tiers, parquet footer/codec caches, page cache)
  *    — then the per-bracket taint needs PER-BRACKET references;
  *  - co-tenant I/O: samples stay elevated for minutes and the decay
  *    tracks host load, not sample count — then the taint is reading a
  *    genuinely dirty window and the pooled references stand.
  *
  * r14 finding (this tool, host load avg 1-3 at launch): scan read
  * 0.25-0.39 for ~8 consecutive samples — far past any JIT/footer
  * warm-up horizon — then settled at ~0.20 while the load decayed,
  * versus the 0.13-0.16 the same kernel reads in a fully-warm bench's
  * POST bracket on a quiet tail. The inflation tracks HOST LOAD, not
  * sample count: co-tenancy, not cold-JVM warm-up, which is what the
  * GATE_r14 window ledger concluded and why the pooled sealed
  * references stand un-split.
  */
object CalibProbe {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val n = args.headOption.map(_.toInt).getOrElse(12)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // mirror the bench's sampleCalib: one unrecorded warm of shuffle+scan
    Bench.quiesce(spark)
    try { Bench.calibShuffle(spark); Bench.calibScan(spark, sfDir); () }
    catch { case _: Throwable => () }
    (1 to n).foreach { i =>
      val sp = Bench.calibSpin()
      val sh = Bench.calibShuffle(spark)
      val sc = Bench.calibScan(spark, sfDir)
      println(f"[calib $i%2d] spin=$sp%.3f shuffle=$sh%.3f scan=$sc%.3f")
    }
    spark.stop()
  }
}
