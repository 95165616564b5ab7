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
  * r14 findings (two runs of this tool — BOTH effects are real):
  *
  *  - host load 1-3: scan read 0.25-0.39 for ~8 samples, noisy,
  *    settling only as the load decayed → co-tenant I/O inflation is
  *    real and tracks load (GATE_r14 window ledger, runs 1/2/5);
  *  - host load 0.01 (idle): scan STILL read
  *    0.257→0.234→0.230→0.208→0.195→0.199 — a genuine ~4-5-iteration
  *    fresh-JVM warm-up slope settling near ~0.20, with the 0.13-0.16
  *    deep-warm floor arriving only after minutes of heavy query work;
  *    the first shuffle job after startup read 0.812 (~2×).
  *
  * Consequence: the bench's PRE-headline bracket sat on the warm-up
  * slope and structurally tripped the per-bracket scan taint on every
  * fresh JVM. Fixed at the source — `Bench.sampleCalib` now warms scan
  * 3× and shuffle 2× before recording — rather than by inflating the
  * sealed references (which would also have blunted real-contention
  * detection: run 2's genuinely-dirty 0.298 pre-bracket is only 1.14×
  * the structural ~0.26 slope median, but 1.5× the settled ~0.20).
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
