package graft.streaming

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Confluent Schema Registry wire framing (public wire format): 1 magic byte
  * 0x00 + 4-byte big-endian schema id + — for the protobuf serde only — a
  * zigzag-varint *message-indexes* block locating the message type inside
  * the .proto file, then the payload. The reference deserializes with
  * Confluent's protobuf serde (internal/schema/schema.go:23-34), which
  * emits/consumes that indexes block; the common case (first top-level
  * message, indexes = [0]) is encoded as the single byte 0x00.
  *
  * Spark's codec functions don't speak this framing, so the engine
  * implements it directly (SURVEY.md §7.4 hard-part 3). Byte-level parsing
  * happens JVM-side ([[stripBytes]], used inside the decode mapPartitions
  * kernel) because the header length is dynamic; the [[strip]] Column
  * wrapper exists for plan-level use on non-hot paths.
  */
object ConfluentFraming {

  final class BadFrame(msg: String) extends RuntimeException(msg)

  private def zigzagEncode(n: Long): Long = (n << 1) ^ (n >> 63)

  private def writeVarint(out: java.io.ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }

  /** Reads a zigzag varint from `buf` at `pos`; returns (value, newPos). */
  private def readZigzag(buf: Array[Byte], pos0: Int): (Long, Int) = {
    var pos = pos0
    var shift = 0
    var raw = 0L
    while (shift <= 63) {
      if (pos >= buf.length) throw new BadFrame("truncated varint in message indexes")
      val b = buf(pos); pos += 1
      raw |= (b & 0x7fL) << shift
      if ((b & 0x80) == 0) return (((raw >>> 1) ^ -(raw & 1)), pos)
      shift += 7
    }
    throw new BadFrame("varint exceeds 64 bits in message indexes")
  }

  /** Parses the full frame header; returns (schemaId, messageIndexes,
    * payloadOffset). Throws [[BadFrame]] on malformed input — callers on
    * the stream path route that to the failed-event counter rather than
    * killing the task.
    */
  def parseHeader(framed: Array[Byte]): (Int, Seq[Int], Int) = {
    if (framed.length < 6) throw new BadFrame(s"frame too short: ${framed.length} bytes")
    if (framed(0) != 0) throw new BadFrame(f"bad magic byte 0x${framed(0)}%02x")
    val schemaId = ((framed(1) & 0xff) << 24) | ((framed(2) & 0xff) << 16) |
      ((framed(3) & 0xff) << 8) | (framed(4) & 0xff)
    val (n, pos1) = readZigzag(framed, 5)
    if (n == 0) (schemaId, Seq(0), pos1) // single-0x00 shorthand for [0]
    else if (n < 0 || n > 128) throw new BadFrame(s"implausible message-index count $n")
    else {
      var pos = pos1
      val idx = Array.ofDim[Int](n.toInt)
      var i = 0
      while (i < n) {
        val (v, p) = readZigzag(framed, pos)
        // A message index is a non-negative position in the .proto's nested
        // message tree — negative or >Int.MaxValue values are a corrupt
        // frame, not data (truncating with toInt would silently alias them).
        if (v < 0 || v > Int.MaxValue)
          throw new BadFrame(s"message index out of range: $v")
        idx(i) = v.toInt; pos = p; i += 1
      }
      (schemaId, idx.toIndexedSeq, pos)
    }
  }

  /** Payload bytes after magic + schema id + message-indexes block. */
  def stripBytes(framed: Array[Byte]): Array[Byte] = {
    val (_, _, off) = parseHeader(framed)
    java.util.Arrays.copyOfRange(framed, off, framed.length)
  }

  /** Message-indexes block of a framed value (e.g. [0] for the first
    * top-level message in the registered .proto).
    */
  def messageIndexes(framed: Array[Byte]): Seq[Int] = parseHeader(framed)._2

  /** Column form of [[stripBytes]] (UDF — fine off the hot path; the
    * streaming decode path parses the header inside its own
    * mapPartitions kernel instead, see [[ProtobufWire.decodeFramed]]).
    * TOTAL over dirty input: null or unframeable bytes yield SQL NULL
    * (filterable/countable at plan level) instead of failing the whole
    * query — a Column op has no access to the malformed counter, so NULL
    * is its count-and-continue equivalent.
    */
  def strip(value: Column): Column =
    udf((b: Array[Byte]) =>
      if (b == null) null
      else try stripBytes(b) catch { case _: BadFrame => null }).apply(value)

  /** Frame a payload for a fixed schema id + message indexes (static per
    * target topic/message type; [0] — the wire shorthand 0x00 — by default).
    */
  def add(payload: Column, schemaId: Int, messageIndexes: Seq[Int] = Seq(0)): Column =
    concat(lit(header(schemaId, messageIndexes)), payload)

  /** The literal header bytes for a schema id + message-indexes list. */
  def header(schemaId: Int, messageIndexes: Seq[Int] = Seq(0)): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(0)
    out.write((schemaId >> 24) & 0xff); out.write((schemaId >> 16) & 0xff)
    out.write((schemaId >> 8) & 0xff); out.write(schemaId & 0xff)
    if (messageIndexes == Seq(0)) out.write(0)
    else {
      writeVarint(out, zigzagEncode(messageIndexes.length.toLong))
      messageIndexes.foreach(i => writeVarint(out, zigzagEncode(i.toLong)))
    }
    out.toByteArray
  }

  /** Schema id carried in a framed value (for routing / compat checks). */
  def schemaId(value: Column): Column =
    conv(hex(substring(value, 2, 4)), 16, 10).cast("int")
}
