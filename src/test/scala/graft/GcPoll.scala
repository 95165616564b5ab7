package graft

/** Shared GC-backstop test idiom: poll `released` while nudging the
  * collector, then separate "the JVM never collected the referent"
  * (environment — caller should cancel) from "collected but not
  * released" (a real bug — caller should fail).
  */
object GcPoll {
  /** Nudge GC and poll until `released` or the deadline (default 15s).
    * Returns true when `released` came true.
    */
  def until(released: => Boolean, deadlineNanos: Long = 15L * 1000 * 1000 * 1000): Boolean = {
    val deadline = System.nanoTime() + deadlineNanos
    while (!released && System.nanoTime() < deadline) {
      System.gc()
      Thread.sleep(50)
    }
    released
  }
}
