package graft.streaming

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Confluent Schema Registry wire framing (public wire format: 1 magic byte
  * 0x00 + 4-byte big-endian schema id + payload). The reference's
  * deserializer strips this before protobuf decode
  * (internal/schema/schema.go:23-34); Spark's codec functions don't speak
  * it, so the engine strips/adds it as plain binary column ops
  * (SURVEY.md §7.4 hard-part 3).
  */
object ConfluentFraming {

  /** Drop the 5-byte header: payload = value[6..] (substring is 1-based). */
  def strip(value: Column): Column = substring(value, 6, Int.MaxValue)

  /** Frame a payload for a fixed schema id (static per target topic). */
  def add(payload: Column, schemaId: Int): Column = {
    val header = Array[Byte](
      0,
      ((schemaId >> 24) & 0xff).toByte,
      ((schemaId >> 16) & 0xff).toByte,
      ((schemaId >> 8) & 0xff).toByte,
      (schemaId & 0xff).toByte)
    concat(lit(header), payload)
  }

  /** Schema id carried in a framed value (for routing / compat checks). */
  def schemaId(value: Column): Column =
    conv(hex(substring(value, 2, 4)), 16, 10).cast("int")
}
