package graft.plans

import java.nio.channels.FileChannel
import java.nio.file.StandardOpenOption.{READ, WRITE}
import org.scalatest.funsuite.AnyFunSuite

/** The GC backstop behind [[IntervalJoinExec]]'s spill-store cleanup
  * (r13-ADVICE residual, closed in r14): a store abandoned without
  * close() — a partially-consumed iterator outside a Spark task — must
  * still release its two files once unreachable, and the explicit close
  * paths must stay once-only when the backstop is also registered.
  */
class IntervalSpillCleanerSpec extends AnyFunSuite {

  private def tempPair(): (Array[java.io.File], Array[FileChannel]) = {
    val files = Array.tabulate(2)(i =>
      java.io.File.createTempFile(s"graft-cleaner-spec-$i-", ".rows"))
    val channels = files.map(f => FileChannel.open(f.toPath, READ, WRITE))
    (files, channels)
  }

  test("explicit clean() closes channels, deletes files, and is once-only") {
    val (files, channels) = tempPair()
    val referent = new Object
    val cleanable = IntervalSpillCleaner.cleaner.register(
      referent, new IntervalSpillCleaner.CloseAction(channels, files))
    assert(files.forall(_.exists()) && channels.forall(_.isOpen))
    cleanable.clean()
    assert(channels.forall(!_.isOpen), "clean() must close both channels")
    assert(files.forall(!_.exists()), "clean() must delete both files")
    // once-only: a second clean() (e.g. iterator exhaustion after a
    // task-completion listener already ran) must be a silent no-op
    cleanable.clean()
  }

  test("GC backstop: an abandoned registration releases the files") {
    val (files, channels) = tempPair()
    var referent: Object = new Object
    // the weak ref separates "the JVM never collected the referent"
    // (environment: e.g. -XX:+DisableExplicitGC ignores the hint →
    // cancel, not fail) from "collected but the files survived" (a real
    // backstop bug → fail)
    val weak = new java.lang.ref.WeakReference[Object](referent)
    IntervalSpillCleaner.cleaner.register(
      referent, new IntervalSpillCleaner.CloseAction(channels, files))
    referent = null // drop the only strong reference
    graft.GcPoll.until(files.forall(!_.exists()))
    if (weak.get() != null) {
      files.foreach(_.delete())
      cancel("JVM did not collect the unreachable referent within 15s " +
        "(explicit-GC hints disabled?) - backstop unobservable here")
    }
    // collected — but the Cleaner's daemon thread runs the CloseAction
    // AFTER collection, so a near-deadline collection can leave the files
    // momentarily alive. One grace poll so only a genuinely stuck cleaner
    // fails (r14 ADVICE).
    graft.GcPoll.until(files.forall(!_.exists()))
    assert(files.forall(!_.exists()),
      "referent collected but the cleaner did not release its files")
    assert(channels.forall(!_.isOpen))
  }
}
