package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Resource probe (r13): drives the interval join's spill regime with a
  * sawtooth-window deep key — many left rows, each re-reading a spilled
  * active set — and samples /proc/self/fd throughout.
  *
  * History: the first r13 spill implementation stored active rows in
  * SortMergeJoin's ExternalAppendOnlyUnsafeRowArray; THIS probe killed
  * it — java.lang.OutOfMemoryError at UnsafeSorterSpillReader.<init>,
  * because every spilled-mode generateIterator() constructs one reader
  * (~1MB buffer) per spill file and each reader's own task-completion
  * listener pins it until task end, drained or not. A per-left-row read
  * pattern therefore leaks ~1MB × spill-files per left row. The shipped
  * explicit spill store (one long-lived channel, positional reads)
  * completes this probe with a flat fd profile; keep running it after
  * any change to the active-set storage.
  */
object FdProbe {
  private def fdCount(): Int =
    Option(new java.io.File("/proc/self/fd").list()).map(_.length).getOrElse(-1)

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.plans.IntervalJoinExec
    spark.conf.set(IntervalJoinExec.InMemoryRowsKey, "16")

    // ONE key, rights never expire (depth grows to ~4000; with
    // inMemoryRows=16 the row bytes live in the explicit store's single
    // long-lived spill file, re-read by positional reads once per left
    // row — the exact access pattern that leaked under EAUA's
    // per-spill-file reader lifecycle). SAWTOOTH left windows: even lefts
    // reach far forward (ingesting ~thousands of rights and draining the
    // active set on emission), odd lefts have a 5-unit window so their
    // emission prefix stops after a handful of rows — under the discarded
    // EAUA draft each such abandoned prefix pinned one ~1MB spill reader
    // per spill file; the shipped store must read only those rows' bytes
    val l = spark.range(4000)
      .select(lit(1L).as("k"), (col("id") * 10).as("lo"), (col("id") % 2).as("par"))
      .withColumn("hi",
        when(col("par") === 0, col("lo") + 100000L).otherwise(col("lo") + 5))
      .drop("par")
    val r = spark.range(4000)
      .select(lit(1L).as("k2"), (col("id") * 10).as("lo2"))
      .withColumn("hi2", col("lo2") + 400000L) // outlives every left
    val before = fdCount()
    val sampler = new Thread(() => {
      var maxFd = 0
      (1 to 120).foreach { _ =>
        maxFd = math.max(maxFd, fdCount()); Thread.sleep(250)
      }
      println(s"[fdprobe] max fd during run: $maxFd")
    })
    sampler.setDaemon(true)
    sampler.start()
    val n = graft.plans.NativeIntervalJoin
      .overlap(l, r, "k", "lo", "hi", "k2", "lo2", "hi2")
      .count()
    val after = fdCount()
    println(s"[fdprobe] rows=$n fd before=$before after=$after")
    Thread.sleep(1000)
    spark.stop()
  }
}
