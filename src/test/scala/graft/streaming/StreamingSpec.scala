package graft.streaming

import graft.SparkSpec
import graft.pipeline.SensorSchemas
import org.apache.avro.Schema
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.avro.io.DecoderFactory
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import java.sql.Timestamp
import scala.jdk.CollectionConverters._

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("tumbling window with watermark drops late data in append mode") {
    val in = MemoryStream[(Timestamp, String)](spark)
    val counts = StreamOps.tumblingCounts(
      in.toDF().toDF("ts", "sensor"), "ts", "10 minutes", "5 minutes", "sensor")
    val q = counts.writeStream.outputMode(OutputMode.Append).format("memory")
      .queryName("tumbling").start()
    in.addData((ts("2024-01-01 10:01:00"), "s1"), (ts("2024-01-01 10:02:00"), "s1"))
    q.processAllAvailable()
    // advance watermark far past the 10:00-10:10 window
    in.addData((ts("2024-01-01 11:00:00"), "s1"))
    q.processAllAvailable()
    // late event for the already-closed window: must be dropped
    in.addData((ts("2024-01-01 10:03:00"), "s1"))
    in.addData((ts("2024-01-01 12:00:00"), "s1"))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("tumbling")
      .select(date_format($"window_start", "HH:mm").as("w"), $"n")
      .as[(String, Long)].collect().toMap
    assert(rows("10:00") == 2) // late third event NOT counted
  }

  test("session windows merge gap-adjacent events") {
    val in = MemoryStream[(Timestamp, String)](spark)
    val sessions = StreamOps.sessionCounts(
      in.toDF().toDF("ts", "user"), "ts", "5 minutes", "1 minute", "user")
    val q = sessions.writeStream.outputMode(OutputMode.Append).format("memory")
      .queryName("sessions").start()
    in.addData(
      (ts("2024-01-01 10:00:00"), "u1"), (ts("2024-01-01 10:03:00"), "u1"),
      (ts("2024-01-01 10:20:00"), "u1"))
    q.processAllAvailable()
    in.addData((ts("2024-01-01 11:00:00"), "u1")) // advance watermark
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("sessions")
      .select(date_format($"session_start", "HH:mm"), $"n").as[(String, Long)]
      .collect().toMap
    assert(rows == Map("10:00" -> 2, "10:20" -> 1))
  }

  test("streaming dedup keeps first occurrence per key within watermark") {
    val in = MemoryStream[(Timestamp, String, String)](spark)
    val dedup = StreamOps.streamingDedup(
      in.toDF().toDF("ts", "hash", "payload"), "ts", "10 minutes", "hash")
    val q = dedup.writeStream.outputMode(OutputMode.Append).format("memory")
      .queryName("dedup").start()
    in.addData(
      (ts("2024-01-01 10:00:00"), "h1", "a"),
      (ts("2024-01-01 10:00:30"), "h1", "b"),
      (ts("2024-01-01 10:01:00"), "h2", "c"))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("dedup").select($"hash").as[String].collect().sorted.toSeq
    assert(got == Seq("h1", "h2"))
  }

  test("alertSummary accumulates per-sensor totals across triggers") {
    val in = MemoryStream[(String, Long)](spark)
    val q = StreamOps.alertSummary(in.toDS()).writeStream
      .outputMode(OutputMode.Update).format("memory").queryName("summary").start()
    in.addData(("s1", 3L), ("s2", 1L))
    q.processAllAvailable()
    in.addData(("s1", 2L))
    q.processAllAvailable()
    q.stop()
    val last = spark.table("summary").groupBy($"sensorId")
      .agg(max($"total").as("t")).as[(String, Long)].collect().toMap
    assert(last == Map("s1" -> 5L, "s2" -> 1L))
  }

  test("stream-static broadcast enrichment") {
    val dim = Seq(("10.0.0.1", "internal"), ("8.8.8.8", "external")).toDF("ip", "zone")
    val in = MemoryStream[String](spark)
    val out = StreamOps.enrichWithStatic(in.toDF().toDF("ip"), dim, "ip")
    val q = out.writeStream.outputMode(OutputMode.Append).format("memory")
      .queryName("enriched").start()
    in.addData("10.0.0.1", "1.2.3.4")
    q.processAllAvailable()
    q.stop()
    val got = spark.table("enriched").as[(String, Option[String])].collect().toMap
    assert(got == Map("10.0.0.1" -> Some("internal"), "1.2.3.4" -> None))
  }

  test("Confluent framing: strip/add/schemaId roundtrip") {
    val payload = "hello".getBytes("UTF-8")
    val df = Seq(Tuple1(payload)).toDF("payload")
      .withColumn("framed", ConfluentFraming.add($"payload", 42))
      .withColumn("stripped", ConfluentFraming.strip($"framed"))
      .withColumn("sid", ConfluentFraming.schemaId($"framed"))
    val row = df.select($"framed", $"stripped", $"sid").head()
    // 6-byte header: magic + schema id + the 0x00 message-indexes shorthand
    assert(row.getAs[Array[Byte]]("framed").length == payload.length + 6)
    assert(row.getAs[Array[Byte]]("stripped").toSeq == payload.toSeq)
    assert(row.getAs[Int]("sid") == 42)
  }

  test("Avro roundtrip: nested struct, nullables, framing in prepared records") {
    val events = spark.createDataFrame(
      Seq(
        Row(Seq(Row.fromSeq(("25/01/31-04:15:06.927463" +: Array.fill[Any](37)(null)).toIndexedSeq)),
          "hash-1", 1L, 1738296906L, "sensor-9", "3.1", 1738296906927463L,
          1738296906900000L, 1738296906000000L, "allow", null, "C2S", "eth0",
          "msg!", 2L, "TCP", 1L, 2L, 3L, "1:10", 1738296906L, "http", null)
      ).asJava,
      SensorSchemas.sensorEventSchema)
    val envelope = graft.pipeline.SnortPipeline.withEnvelope(
      graft.pipeline.SnortPipeline.alerts(events))
    val recs = KafkaSink.prepareRecords(envelope, "alerts", schemaId = 7).collect()
    assert(recs.length == 1)
    val r = recs.head
    assert(new String(r.key, "UTF-8") == "hash-1")
    assert(r.headers("classification") == "") // null-safe where reference panics
    assert(r.headers("priorityStr") == "Medium")
    assert(r.timestampMs == 1738296906927L)   // true event-time stamp
    // value: 5-byte Confluent frame then Avro binary
    assert(r.value(0) == 0 && r.value(4) == 7)
    val alertType = envelope.drop("kafka_key", "event_time", "headers").schema
    val schema = AvroCodec.avroSchema(alertType, "SnortAlert")
    val reader = new GenericDatumReader[GenericRecord](schema)
    val decoder = DecoderFactory.get().binaryDecoder(r.value.drop(5), null)
    val rec = reader.read(null, decoder)
    val md = rec.get("metadata").asInstanceOf[GenericRecord]
    assert(md.get("hash_sha256").toString == "hash-1")
    assert(md.get("read_at").toString == "2025-01-31T04:15:06.927Z")
    assert(rec.get("priority_str").toString == "Medium")
    assert(rec.get("class") == null)
    assert(rec.get("vlan") == null)
  }

  test("stream-stream join: matches within lag, drops outside, outer-pads after watermark") {
    val alerts = MemoryStream[(Timestamp, String, String)](spark)
    val acks = MemoryStream[(Timestamp, String, String)](spark)
    val joined = StreamOps.streamStreamJoin(
      alerts.toDF().toDF("ts", "sensor", "alert"), "ts", "1 minute",
      acks.toDF().toDF("ts", "sensor", "ack"), "ts", "1 minute",
      key = "sensor", maxLag = "5 minutes", joinType = "leftOuter")
    val q = joined.writeStream.outputMode(OutputMode.Append).format("memory")
      .queryName("ssjoin").start()
    alerts.addData(
      (ts("2024-01-01 10:00:00"), "s1", "a1"), // acked 3 min later → match
      (ts("2024-01-01 10:00:00"), "s2", "a2")) // acked 20 min later → outside lag
    acks.addData(
      (ts("2024-01-01 10:03:00"), "s1", "k1"),
      (ts("2024-01-01 10:20:00"), "s2", "k2"))
    q.processAllAvailable()
    // push BOTH watermarks past 10:05 so s2's join window provably closes
    // and the left-outer null row can be emitted
    alerts.addData((ts("2024-01-01 11:00:00"), "s9", "a9"))
    acks.addData((ts("2024-01-01 11:00:00"), "s9", "k9"))
    q.processAllAvailable()
    alerts.addData((ts("2024-01-01 12:00:00"), "s9", "a9b"))
    acks.addData((ts("2024-01-01 12:00:00"), "s9", "k9b"))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("ssjoin").select($"alert", $"r_ack")
      .as[(String, Option[String])].collect().toMap
    assert(rows("a1").contains("k1"))   // in-window ack joined
    assert(rows("a2").isEmpty)          // 20-min ack outside 5-min lag → null-padded
  }

  test("stream-stream FULL outer join pads the unmatched side after both watermarks") {
    val alerts = MemoryStream[(Timestamp, String, String)](spark)
    val acks = MemoryStream[(Timestamp, String, String)](spark)
    val joined = StreamOps.streamStreamJoin(
      alerts.toDF().toDF("ts", "sensor", "alert"), "ts", "1 minute",
      acks.toDF().toDF("ts", "sensor", "ack"), "ts", "1 minute",
      key = "sensor", maxLag = "5 minutes", joinType = "fullOuter")
    val q = joined.writeStream.outputMode(OutputMode.Append).format("memory")
      .queryName("ssjoin_full").start()
    alerts.addData((ts("2024-01-01 10:00:00"), "s1", "a1")) // never acked
    acks.addData((ts("2024-01-01 10:01:00"), "s2", "k2"))   // ack w/o alert
    q.processAllAvailable()
    // advance both watermarks decisively past every join window
    for (h <- Seq("11:00:00", "12:00:00")) {
      alerts.addData((ts(s"2024-01-01 $h"), "s9", "a9"))
      acks.addData((ts(s"2024-01-01 $h"), "s9", "k9"))
      q.processAllAvailable()
    }
    q.stop()
    val rows = spark.table("ssjoin_full").select($"alert", $"r_ack")
      .as[(Option[String], Option[String])].collect().toSet
    // the unmatched alert AND the unmatched ack both surface null-padded
    assert(rows.contains((Some("a1"), None)), s"unmatched left row missing: $rows")
    assert(rows.contains((None, Some("k2"))), s"unmatched right row missing: $rows")
  }

  test("sinkAlerts streams fixture events through foreachBatch to a writer") {
    val collected = new java.util.concurrent.ConcurrentLinkedQueue[KafkaSink.PreparedRecord]()
    CollectingWriter.queue = collected
    val in = MemoryStream[String](spark)
    // carry the fixture through a JSON column to keep MemoryStream simple
    val fixture = """{"metrics":[{"snort_timestamp":"25/01/31-04:15:06.927463"}],
      "event_hash_sha256":"hs","event_metrics_count":1,"event_seconds":1738296906,
      "sensor_id":"s","sensor_version":"1","event_read_at":1738296906927463,
      "event_sent_at":1738296906900000,"event_received_at":1738296906000000,
      "snort_interface":"eth0","snort_message":"m","snort_priority":1,
      "snort_protocol":"TCP","snort_rule_gid":1,"snort_rule_rev":1,
      "snort_rule_sid":1,"snort_rule":"r","snort_seconds":1738296906}""".replaceAll("\n\\s*", "")
    val parsed = in.toDF()
      .select(from_json($"value", SensorSchemas.sensorEventSchema).as("e"))
      .select("e.*")
    val q = KafkaSink.sinkAlerts(parsed, "t", 1, () => new CollectingWriter).start()
    in.addData(fixture)
    q.processAllAvailable()
    q.stop()
    assert(collected.size() == 1)
    assert(new String(collected.peek().key, "UTF-8") == "hs")
  }
}

/** Writer that collects into a static queue (executors share the JVM in
  * local mode, so the static is visible to the test).
  */
class CollectingWriter extends KafkaSink.RecordWriter {
  def send(r: KafkaSink.PreparedRecord): Unit = CollectingWriter.queue.add(r)
}
object CollectingWriter {
  @volatile var queue: java.util.concurrent.ConcurrentLinkedQueue[KafkaSink.PreparedRecord] = _
}
