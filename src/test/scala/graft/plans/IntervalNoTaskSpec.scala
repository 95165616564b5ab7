package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, GenericInternalRow}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.LocalTableScanExec
import org.apache.spark.sql.types.LongType

/** End-to-end drive of [[IntervalJoinExec]]'s NO-TASK cleanup paths: the
  * output RDD's partition computed on the driver thread with no
  * thread-local TaskContext (the direct-doExecute environment of tests
  * and tools). Two paths own the spill files there:
  *   - exhaustion: the hasNext wrapper closes the store when the output
  *     iterator drains;
  *   - abandonment: a partially-consumed iterator that is dropped is
  *     caught by the [[IntervalSpillCleaner]] GC backstop.
  */
class IntervalNoTaskSpec extends SparkSpec {

  private def attr(n: String) = AttributeReference(n, LongType, nullable = false)()

  private def row(vs: Long*): InternalRow =
    new GenericInternalRow(vs.map(v => v: Any).toArray)

  /** Spill files currently present in Spark's local scratch dir. The
    * dir is JVM-global (one shared session), so tests assert on the
    * DELTA vs a snapshot taken before their own iterator, never on the
    * dir being globally empty — another suite's file (e.g. an abandoned
    * no-task iterator still awaiting GC) must not fail them.
    */
  private def spillFiles(): Set[String] = {
    val d = org.apache.spark.graftbridge.CoreBridge.localDir()
    Option(d.list()).map(_.toSet.filter((n: String) => n.startsWith("graft-interval-spill-")))
      .getOrElse(Set.empty)
  }

  private def deleteSpillFiles(names: Set[String]): Unit = {
    val d = org.apache.spark.graftbridge.CoreBridge.localDir()
    names.foreach(n => { new java.io.File(d, n).delete(); () })
  }

  /** Build the exec over one deep key (depth 64 >> inMemoryRows 4, so
    * the store engages) and return its single partition's iterator,
    * computed WITHOUT a thread-local TaskContext.
    */
  private def noTaskIterator(): Iterator[InternalRow] = {
    val (lk, llo, lhi) = (attr("lk"), attr("llo"), attr("lhi"))
    val (rk, rlo, rhi) = (attr("rk"), attr("rlo"), attr("rhi"))
    // rights: one key, 64 intervals all covering [0, 1000] (max depth);
    // lefts: sorted probes inside the band — every left matches all 64
    val rights = (0 until 64).map(i => row(1L, i.toLong, 1000L + i))
    val lefts = (0 until 32).map(i => row(1L, 100L + i, 120L + i))
    val exec = IntervalJoinExec(
      LocalTableScanExec(Seq(lk, llo, lhi), lefts, None),
      LocalTableScanExec(Seq(rk, rlo, rhi), rights, None),
      lk, rk, llo, lhi, rlo, rhi)
    val rdd = exec.execute()
    assert(rdd.getNumPartitions == 1, s"expected 1 partition, got ${rdd.getNumPartitions}")
    assert(org.apache.spark.TaskContext.get() == null)
    rdd.compute(rdd.partitions(0),
      org.apache.spark.graftbridge.TestTaskContextBridge.emptyTaskContext())
  }

  private def withTinySpill[T](body: => T): T = {
    spark.conf.set("spark.sql.leafNodeDefaultParallelism", "1")
    spark.conf.set(IntervalJoinExec.InMemoryRowsKey, "4")
    spark.conf.set(IntervalJoinExec.CompactMinBytesKey, "1")
    try body
    finally {
      spark.conf.unset("spark.sql.leafNodeDefaultParallelism")
      spark.conf.unset(IntervalJoinExec.InMemoryRowsKey)
      spark.conf.unset(IntervalJoinExec.CompactMinBytesKey)
    }
  }

  test("no-task exhaustion: the output iterator's drain closes the spill files") {
    withTinySpill {
      val before = spillFiles()
      val it = noTaskIterator()
      var n = 0L
      var sawSpill = false
      while (it.hasNext) {
        it.next(); n += 1
        if ((spillFiles() -- before).nonEmpty) sawSpill = true
      }
      assert(n == 32L * 64, s"expected 2048 joined rows, got $n")
      assert(sawSpill, "the store never spilled - the fixture lost its deep key")
      assert((spillFiles() -- before).isEmpty,
        s"exhausted no-task iterator left spill files: ${spillFiles() -- before}")
    }
  }

  test("no-task abandonment: a dropped partial iterator is reclaimed by the GC backstop") {
    withTinySpill {
      val before = spillFiles()
      var it = noTaskIterator()
      val weak = new java.lang.ref.WeakReference[AnyRef](it)
      (0 until 10).foreach(_ => it.next()) // partial consumption engages the store
      def mine = spillFiles() -- before
      assert(mine.nonEmpty, "fixture did not spill")
      it = null // abandon mid-stream; only the cleaner can release the files now
      graft.GcPoll.until(mine.isEmpty)
      if (weak.get() != null) {
        // environment, not a bug: tidy this test's own files so later
        // tests in the same JVM see a clean delta (the channels stay
        // open - only the uncollected store could close them)
        deleteSpillFiles(mine)
        cancel("JVM did not collect the abandoned iterator within 15s - " +
          "backstop unobservable here")
      }
      // the referent IS collected, but the Cleaner runs its CloseAction on
      // a daemon thread AFTER the collection — a collection landing near
      // the first poll's deadline can leave weak.get() null with the files
      // momentarily alive. Grant the cleaner thread its own grace poll so
      // only a genuinely stuck cleaner fails (r14 ADVICE).
      graft.GcPoll.until(mine.isEmpty)
      assert(mine.isEmpty, s"iterator collected but spill files survived: $mine")
    }
  }
}
