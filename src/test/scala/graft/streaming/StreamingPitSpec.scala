package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Stream-static point-in-time enrichment (StreamOps.pointInTimeEnrich) —
  * the serving-side twin of q_join_point_in_time: each streaming event
  * must see the dim VERSION valid at its own event time. Pins: boundary
  * selection (valid_from inclusive, valid_to exclusive), the no-version
  * null path, and exactly-one-version matching per event.
  */
class StreamingPitSpec extends SparkSpec {
  import spark.implicits._
  import StreamOps.UserEvent

  test("each streamed event picks the dim version valid at its event time") {
    // user 1 has three versions partitioning time; user 2 has none
    val dim = Seq(
      (1L, 0L, 100L, "v1"),
      (1L, 100L, 200L, "v2"),
      (1L, 200L, Long.MaxValue, "v3")
    ).toDF("userId", "valid_from_us", "valid_to_us", "ver")

    val in = MemoryStream[UserEvent](spark)
    val out = StreamOps.pointInTimeEnrich(in.toDF(), dim, "userId", "tsUs")
      .select($"eventId", $"ver")
    val q = out.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("pit_stream").start()
    in.addData(
      UserEvent(1L, 50L, 1L, "view", 0L),    // inside v1
      UserEvent(1L, 100L, 2L, "view", 0L),   // boundary: v2 from-inclusive
      UserEvent(1L, 199L, 3L, "view", 0L),   // last instant of v2
      UserEvent(1L, 200L, 4L, "view", 0L),   // boundary: v3
      UserEvent(2L, 50L, 5L, "view", 0L))    // no versions → null
    q.processAllAvailable()
    q.stop()
    val got = spark.table("pit_stream")
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got == Map(
      1L -> Some("v1"), 2L -> Some("v2"), 3L -> Some("v2"),
      4L -> Some("v3"), 5L -> None))
    // exactly one output row per input event — intervals partition time
    assert(spark.table("pit_stream").count() == 5L)
  }
}
