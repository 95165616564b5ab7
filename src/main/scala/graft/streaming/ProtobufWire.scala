package graft.streaming

import graft.pipeline.SensorSchemas
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets

/** Hand-rolled protobuf wire-format codec for `SensorEvent`/`Metric`
  * (public protobuf encoding spec; message shape from
  * protos/sensor_event.proto:8-73). The image ships no spark-protobuf
  * module, so registry-framed protobuf ingest (reference
  * internal/schema/schema.go:23-34) needs its own decoder: strip the
  * Confluent header ([[ConfluentFraming]]), then parse the wire format.
  *
  * proto3 rules honored: varint int64, length-delimited strings/messages,
  * unknown fields skipped, missing scalar = default (0 / ""), `optional`
  * fields null when absent. Field numbers are mapped to schema NAMES, so
  * schema column order is irrelevant.
  */
object ProtobufWire {

  // field number → (column name, is string) tables from the proto
  private val metricFields: Map[Int, String] = Map(
    1 -> "snort_timestamp", 2 -> "snort_base64_data", 3 -> "snort_client_bytes",
    4 -> "snort_client_pkts", 5 -> "snort_dst_address", 6 -> "snort_dst_port",
    7 -> "snort_dst_ap", 8 -> "snort_eth_dst", 9 -> "snort_eth_len",
    10 -> "snort_eth_src", 11 -> "snort_eth_type", 12 -> "snort_flowstart_time",
    13 -> "snort_geneve_vni", 14 -> "snort_icmp_code", 15 -> "snort_icmp_id",
    16 -> "snort_icmp_seq", 17 -> "snort_icmp_type", 18 -> "snort_ip_id",
    19 -> "snort_ip_length", 20 -> "snort_mpls", 21 -> "snort_pkt_gen",
    22 -> "snort_pkt_length", 23 -> "snort_pkt_number", 24 -> "snort_server_bytes",
    25 -> "snort_server_pkts", 26 -> "snort_sgt", 27 -> "snort_src_address",
    28 -> "snort_src_port", 29 -> "snort_src_ap", 30 -> "snort_target",
    31 -> "snort_tcp_ack", 32 -> "snort_tcp_flags", 33 -> "snort_tcp_len",
    34 -> "snort_tcp_seq", 35 -> "snort_tcp_win", 36 -> "snort_time_to_live",
    37 -> "snort_udp_length", 38 -> "snort_vlan")

  private val eventFields: Map[Int, String] = Map(
    1 -> "metrics", 2 -> "event_hash_sha256", 3 -> "event_metrics_count",
    4 -> "event_seconds", 5 -> "sensor_id", 6 -> "sensor_version",
    7 -> "event_read_at", 8 -> "event_sent_at", 9 -> "event_received_at",
    10 -> "snort_action", 11 -> "snort_classification", 12 -> "snort_direction",
    13 -> "snort_interface", 14 -> "snort_message", 15 -> "snort_priority",
    16 -> "snort_protocol", 17 -> "snort_rule_gid", 18 -> "snort_rule_rev",
    19 -> "snort_rule_sid", 20 -> "snort_rule", 21 -> "snort_seconds",
    22 -> "snort_service", 23 -> "snort_type_of_service")

  // ---- wire primitives ----------------------------------------------------

  /** Thrown for truncated/corrupt payloads — callers route the record to
    * the malformed path instead of failing the task (a poison Kafka message
    * must not kill the stream; the reference counts failed events,
    * internal/app/app.go:85-97).
    */
  final class MalformedRecord(msg: String) extends RuntimeException(msg)

  private final class Reader(buf: Array[Byte]) {
    var pos = 0
    def hasMore: Boolean = pos < buf.length
    def readVarint(): Long = {
      var shift = 0
      var result = 0L
      while (shift <= 63) {
        if (pos >= buf.length) throw new MalformedRecord("truncated varint")
        val b = buf(pos); pos += 1
        result |= (b & 0x7fL) << shift
        if ((b & 0x80) == 0) return result
        shift += 7
      }
      throw new MalformedRecord("varint exceeds 64 bits")
    }
    def readLen(): Int = {
      val n = readVarint()
      if (n < 0 || pos + n > buf.length) throw new MalformedRecord(s"bad length $n")
      n.toInt
    }
    def readBytes(n: Int): Array[Byte] = {
      if (n < 0 || pos + n > buf.length) throw new MalformedRecord(s"truncated bytes $n")
      val out = java.util.Arrays.copyOfRange(buf, pos, pos + n)
      pos += n
      out
    }
    def skip(wireType: Int): Unit = wireType match {
      case 0 => readVarint()
      case 1 => pos += 8; if (pos > buf.length) throw new MalformedRecord("truncated fixed64")
      case 2 =>
        // NOT `pos += readLen()`: that reads the old pos before readLen()
        // advances past the length varint, silently rewinding the cursor.
        val n = readLen(); pos += n
      case 5 => pos += 4; if (pos > buf.length) throw new MalformedRecord("truncated fixed32")
      case other => throw new MalformedRecord(s"unsupported wire type $other")
    }
  }

  private def writeVarint(out: ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0) {
      out.write(((v & 0x7f) | 0x80).toInt)
      v >>>= 7
    }
    out.write(v.toInt)
  }

  private def writeTag(out: ByteArrayOutputStream, field: Int, wireType: Int): Unit =
    writeVarint(out, (field.toLong << 3) | wireType)

  private def writeString(out: ByteArrayOutputStream, field: Int, s: String): Unit = {
    val bytes = s.getBytes(StandardCharsets.UTF_8)
    writeTag(out, field, 2); writeVarint(out, bytes.length); out.write(bytes, 0, bytes.length)
  }

  // ---- decode -------------------------------------------------------------

  private def decodeMessage(
      bytes: Array[Byte],
      schema: StructType,
      fields: Map[Int, String],
      metricsCollector: Option[collection.mutable.ArrayBuffer[Row]]): Row = {
    val values = collection.mutable.Map[String, Any]()
    val r = new Reader(bytes)
    while (r.hasMore) {
      val tag = r.readVarint()
      val fieldNum = (tag >>> 3).toInt
      val wireType = (tag & 7).toInt
      // Known fields are read ONLY when the record's wire type matches the
      // expected one (2 for strings/messages, 0 for varint longs); a
      // mismatch is treated as an unknown field and skipped — proto3
      // conformance semantics, and it prevents a drifted producer schema
      // from silently misreading a varint as a length (yielding wrong
      // column values instead of a skip).
      fields.get(fieldNum) match {
        case Some("metrics") if wireType == 2 =>
          metricsCollector.get += decodeMetric(r.readBytes(r.readLen()))
        case Some(name) if name != "metrics" =>
          schema(name).dataType match {
            case StringType if wireType == 2 =>
              values(name) = new String(r.readBytes(r.readLen()), StandardCharsets.UTF_8)
            case LongType if wireType == 0 =>
              values(name) = r.readVarint()
            case StringType | LongType => r.skip(wireType) // wrong wire type → unknown
            case other => throw new IllegalArgumentException(s"unsupported $other")
          }
        case _ => r.skip(wireType)
      }
    }
    Row.fromSeq(schema.fields.map { f =>
      values.get(f.name).getOrElse {
        f.name match {
          case "metrics" => metricsCollector.get.toSeq
          // proto3 presence: plain scalars default, `optional` ones null
          case _ if !f.nullable && f.dataType == StringType => ""
          case _ if !f.nullable && f.dataType == LongType   => 0L
          case _ => null
        }
      }
    }.toIndexedSeq)
  }

  def decodeMetric(bytes: Array[Byte]): Row =
    decodeMessage(bytes, SensorSchemas.metricSchema, metricFields, None)

  def decodeSensorEvent(bytes: Array[Byte]): Row =
    decodeMessage(bytes, SensorSchemas.sensorEventSchema, eventFields,
      Some(collection.mutable.ArrayBuffer.empty[Row]))

  /** Named failed-event counter, visible in the Spark UI / status API —
    * the engine's form of the reference's count-and-continue failed-event
    * accounting (app.go:85-97). Create once per pipeline and pass to
    * [[decode]]/[[decodeFramed]].
    */
  def malformedCounter(spark: org.apache.spark.sql.SparkSession): org.apache.spark.util.LongAccumulator =
    spark.sparkContext.longAccumulator("graft.protobuf.malformed_records")

  /** DataFrame op: binary `valueCol` (already Confluent-stripped) →
    * full SensorEvent rows. Implemented with Dataset.mapPartitions (NOT
    * .rdd, which forces batch execution and is illegal on streaming plans),
    * so the same operator serves batch frames and `readStream` pipelines.
    * Malformed records are counted on `malformed` (when given) and dropped,
    * mirroring the reference's count-and-continue handling of failed
    * events (app.go:85-97) — poison Kafka messages must not kill the
    * stream, but their rate must stay observable.
    */
  def decode(
      df: DataFrame,
      valueCol: String,
      malformed: Option[org.apache.spark.util.LongAccumulator] = None): DataFrame =
    decodeWith(df, valueCol, malformed)(identity)

  /** Like [[decode]] but takes the raw Confluent-framed Kafka value and
    * parses magic + schema id + message-indexes inside the same kernel
    * (the indexes block is variable-length, so framing cannot be a static
    * `substring`). Bad frames count as malformed too.
    */
  def decodeFramed(
      df: DataFrame,
      valueCol: String,
      malformed: Option[org.apache.spark.util.LongAccumulator] = None): DataFrame =
    decodeWith(df, valueCol, malformed)(ConfluentFraming.stripBytes)

  private def decodeWith(
      df: DataFrame,
      valueCol: String,
      malformed: Option[org.apache.spark.util.LongAccumulator])(
      unframe: Array[Byte] => Array[Byte]): DataFrame = {
    val idx = df.schema.fieldIndex(valueCol)
    implicit val enc: org.apache.spark.sql.Encoder[Row] =
      org.apache.spark.sql.Encoders.row(SensorSchemas.sensorEventSchema)
    df.mapPartitions { it =>
      it.flatMap { r =>
        // Null value = Kafka tombstone (compacted-topic delete marker):
        // count-and-drop like any other undecodable record — one tombstone
        // must not kill the stream (poison-message contract, app.go:85-97).
        val bytes = r.getAs[Array[Byte]](idx)
        if (bytes == null) {
          malformed.foreach(_.add(1L))
          None
        } else
          try Some(decodeSensorEvent(unframe(bytes)))
          catch {
            case _: MalformedRecord | _: ConfluentFraming.BadFrame =>
              malformed.foreach(_.add(1L))
              None
          }
      }
    }
  }

  // ---- encode (tests + sink symmetry) ------------------------------------

  private def encodeMessage(row: Row, schema: StructType, fields: Map[Int, String]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val byName = fields.map(_.swap)
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      if (!row.isNullAt(i)) {
        val fieldNum = byName(f.name)
        f.dataType match {
          case StringType => writeString(out, fieldNum, row.getString(i))
          case LongType   => writeTag(out, fieldNum, 0); writeVarint(out, row.getLong(i))
          case ArrayType(m: StructType, _) =>
            row.getSeq[Row](i).foreach { metric =>
              val body = encodeMessage(metric, m, metricFields)
              writeTag(out, fieldNum, 2); writeVarint(out, body.length)
              out.write(body, 0, body.length)
            }
          case other => throw new IllegalArgumentException(s"unsupported $other")
        }
      }
    }
    out.toByteArray
  }

  def encodeSensorEvent(row: Row): Array[Byte] =
    encodeMessage(row, SensorSchemas.sensorEventSchema, eventFields)
}
