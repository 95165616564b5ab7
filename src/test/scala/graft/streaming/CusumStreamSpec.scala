package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Streaming CUSUM (StatefulOps.cusumMonitor) — the one-long-of-state
  * recursion twin of q_ts_cusum's prefix-min window identity. Pins:
  * sequential-replay parity (statistic AND latched first-alarm event),
  * ordered trigger-split invariance, and the negative-run reset.
  */
class CusumStreamSpec extends SparkSpec {
  import spark.implicits._
  import StreamOps.UserEvent
  import StatefulOps.CusumState

  private val Target = 100L
  private val Threshold = 150L

  private def run(batches: Seq[Seq[UserEvent]], name: String): Map[Long, CusumState] =
    withRocksDBProvider {
      val in = MemoryStream[UserEvent](spark)
      val q = StatefulOps.cusumMonitor(in.toDS(), Target, Threshold)
        .writeStream.outputMode(OutputMode.Update).format("memory")
        .queryName(name).start()
      batches.foreach { b => in.addData(b); q.processAllAvailable() }
      q.stop()
      spark.table(name).as[CusumState].collect().toSeq
        .groupBy(_.userId).map { case (u, rs) => u -> rs.maxBy(_.nEvents) }
    }

  private def replay(events: Seq[(Long, Long)]): (Long, Long) = {
    // sequential truth: (final S, first alarm event id or -1)
    var s = 0L; var alarm = -1L
    events.foreach { case (eid, cents) =>
      s = math.max(0L, s + (cents - Target))
      if (s > Threshold && alarm < 0) alarm = eid
    }
    (s, alarm)
  }

  // user 1: sustained drift → alarm; user 2: spike absorbed by a negative
  // run (reset to 0, no alarm); user 3: exactly at threshold (no alarm —
  // strict crossing)
  private val cases: Map[Long, Seq[(Long, Long)]] = Map(
    1L -> Seq((1L, 180L), (2L, 190L), (3L, 170L)),
    2L -> Seq((4L, 240L), (5L, 10L), (6L, 20L), (7L, 110L)),
    3L -> Seq((8L, 250L)))

  private def events(uid: Long): Seq[UserEvent] =
    cases(uid).zipWithIndex.map { case ((eid, c), i) =>
      UserEvent(uid, 100L + i, eid, "view", c)
    }

  test("single trigger matches the sequential replay, including the alarm latch") {
    val got = run(Seq(cases.keys.toSeq.sorted.flatMap(events)), "cusum_one")
    cases.foreach { case (u, evs) =>
      val (s, alarm) = replay(evs)
      assert(got(u).cusum == s && got(u).firstAlarmEventId == alarm,
        s"user $u: got ${got(u)}, want (s=$s, alarm=$alarm)")
    }
    assert(got(1L).firstAlarmEventId == 2L)  // crosses on the second event
    assert(got(2L).firstAlarmEventId == -1L) // reset absorbed the spike
    assert(got(3L).firstAlarmEventId == -1L) // s == threshold, strict
  }

  test("state carries across ordered trigger splits") {
    val all = cases.keys.toSeq.sorted.flatMap(events)
    val got = run(all.map(Seq(_)), "cusum_rows")
    cases.foreach { case (u, evs) =>
      val (s, alarm) = replay(evs)
      assert(got(u).cusum == s && got(u).firstAlarmEventId == alarm)
    }
  }
}
