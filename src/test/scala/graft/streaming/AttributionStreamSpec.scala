package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Streaming last-touch attribution (StreamOps.lastTouchAttribution) — the
  * incremental twin of the batch q_events_attribution window pass. Pins:
  * single-trigger parity with the batch semantics (including ts ties broken
  * by event id), trigger-split invariance under in-order delivery, 'none'
  * for touchless purchases, and the documented append-mode trade-off (a
  * touch arriving after the purchase cannot retro-claim it, but does claim
  * later purchases).
  */
class AttributionStreamSpec extends SparkSpec {
  import spark.implicits._
  import StreamOps.{AttributedPurchase, UserEvent}

  private def run(batches: Seq[Seq[UserEvent]], name: String): Map[Long, String] = {
    val in = MemoryStream[UserEvent](spark)
    val q = StreamOps.lastTouchAttribution(in.toDS())
      .writeStream.outputMode(OutputMode.Append).format("memory")
      .queryName(name).start()
    batches.foreach { b => in.addData(b); q.processAllAvailable() }
    q.stop()
    spark.table(name).as[AttributedPurchase].collect()
      .map(p => p.purchaseEventId -> p.touchType).toMap
  }

  private val events = Seq(
    UserEvent(1L, 100L, 1L, "view", 0L),
    UserEvent(1L, 200L, 2L, "click", 0L),
    UserEvent(1L, 300L, 3L, "purchase", 999L), // latest preceding = click
    UserEvent(1L, 300L, 4L, "view", 0L),       // same ts as next purchase,
    UserEvent(1L, 300L, 5L, "purchase", 500L), //   smaller id → view wins
    UserEvent(2L, 50L, 6L, "purchase", 100L),  // no touch ever → none
    UserEvent(3L, 10L, 7L, "purchase", 10L),   // purchase BEFORE any touch
    UserEvent(3L, 20L, 8L, "view", 0L),
    UserEvent(3L, 30L, 9L, "purchase", 20L))

  private val want = Map(3L -> "click", 5L -> "view", 6L -> "none",
    7L -> "none", 9L -> "view")

  test("single trigger matches the batch attribution semantics") {
    assert(run(Seq(events), "attr_one") == want)
  }

  test("in-order trigger splits cannot change the result") {
    assert(run(events.grouped(2).toSeq, "attr_split") == want)
    assert(run(events.map(Seq(_)), "attr_rows") == want)
  }

  test("a touch arriving after the purchase claims only later purchases") {
    val out = run(Seq(
      Seq(UserEvent(9L, 100L, 1L, "purchase", 1L)),
      Seq(UserEvent(9L, 50L, 2L, "click", 0L)), // late touch, older ts
      Seq(UserEvent(9L, 200L, 3L, "purchase", 2L))), "attr_late")
    assert(out == Map(1L -> "none", 3L -> "click"))
  }
}
