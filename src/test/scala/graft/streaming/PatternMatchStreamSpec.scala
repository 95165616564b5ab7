package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Streaming CEP (StatefulOps.patternMatchCounts) — the vc*p DFA folded
  * over per-user event streams. Pins: single-trigger parity with the
  * batch regex scanner (java.util.regex non-overlapping count, the same
  * engine q_events_pattern_match's Spark side uses), ordered trigger-split
  * invariance (DFA state carries across triggers), and the scanner's
  * restart-at-v semantics on adversarial sequences.
  */
class PatternMatchStreamSpec extends SparkSpec {
  import spark.implicits._
  import StreamOps.UserEvent
  import StatefulOps.PatternCount

  /** Batch truth: non-overlapping left-to-right regex count over the
    * symbol string — independent implementation of the DFA's semantics.
    */
  private def regexCount(syms: String): Long =
    "vc*p".r.findAllMatchIn(syms).length.toLong

  private def ev(uid: Long, seq: String): Seq[UserEvent] = {
    val full = Map('v' -> "view", 'c' -> "click", 'p' -> "purchase",
      's' -> "signup", 'e' -> "error")
    seq.zipWithIndex.map { case (ch, i) =>
      UserEvent(uid, 100L + i, i.toLong, full(ch), 0L)
    }
  }

  private def run(batches: Seq[Seq[UserEvent]], name: String): Map[Long, PatternCount] =
    withRocksDBProvider {
      val in = MemoryStream[UserEvent](spark)
      val q = StatefulOps.patternMatchCounts(in.toDS())
        .writeStream.outputMode(OutputMode.Update).format("memory")
        .queryName(name).start()
      batches.foreach { b => in.addData(b); q.processAllAvailable() }
      q.stop()
      spark.table(name).as[PatternCount].collect().toSeq
        .groupBy(_.userId).map { case (u, rs) => u -> rs.maxBy(_.nEvents) }
    }

  private val cases = Map(
    1L -> "vcp",      // one clean funnel
    2L -> "vvp",      // restart-at-v: second v carries the prefix
    3L -> "vccepvp",  // abandoned prefix (error), then a second match
    4L -> "cpvppvcc", // leading orphan c/p; trailing open prefix unmatched
    5L -> "sss")      // no prefix at all

  test("single trigger matches the batch regex scanner per user") {
    val got = run(Seq(cases.toSeq.flatMap { case (u, s) => ev(u, s) }), "cep_one")
    cases.foreach { case (u, s) =>
      assert(got(u).nMatches == regexCount(s), s"user $u seq $s")
      assert(got(u).nEvents == s.length.toLong)
    }
  }

  test("DFA state carries across ordered trigger splits") {
    // split every user's sequence at position 2 — prefixes opened in
    // trigger 1 must complete in trigger 2
    val all = cases.toSeq.flatMap { case (u, s) => ev(u, s) }
    val (first, second) = all.partition(_.eventId < 2L)
    val got = run(Seq(first, second), "cep_split")
    cases.foreach { case (u, s) =>
      assert(got(u).nMatches == regexCount(s), s"user $u seq $s")
    }
    // one row per trigger
    val rows = run(all.map(Seq(_)), "cep_rows")
    cases.foreach { case (u, s) => assert(rows(u).nMatches == regexCount(s)) }
  }

  test("regex truth sanity: the scanner counts what the comments claim") {
    assert(regexCount("vcp") == 1L && regexCount("vvp") == 1L &&
      regexCount("vccepvp") == 1L && regexCount("cpvppvcc") == 1L &&
      regexCount("sss") == 0L && regexCount("vcpvcp") == 2L)
  }
}
