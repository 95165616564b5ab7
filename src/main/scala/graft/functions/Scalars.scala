package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar column functions re-expressing the reference's per-record transforms
  * (mata-elang-stable/event-stream-aggr) as codegen-friendly Catalyst
  * expressions — no UDFs, so all of these stay inside whole-stage codegen.
  */
object Scalars {

  /** Snort priority number → label.
    * Reference: internal/processor/processor.go:109-120 (1/2/3/else →
    * High/Medium/Low/Informational).
    */
  def priorityLabel(priority: Column): Column =
    when(priority === 1, "High")
      .when(priority === 2, "Medium")
      .when(priority === 3, "Low")
      .otherwise("Informational")

  /** Unix-microseconds epoch → ISO-8601 UTC string with Go `.999`
    * fraction-trimming semantics: microseconds are TRUNCATED to milliseconds,
    * trailing fractional zeros are trimmed, and a bare second has no dot.
    * Golden vectors (internal/processor/processor_test.go:14-18):
    *   1738296906927463 → "2025-01-31T04:15:06.927Z"
    *   1738296906900000 → "2025-01-31T04:15:06.9Z"
    *   1738296906000000 → "2025-01-31T04:15:06Z"
    * Reference: internal/processor/processor.go:16-18.
    *
    * `date_format(..., "SSS")` prints the first three fraction digits of the
    * microsecond-precision timestamp (truncation, matching Go), then one
    * regexp trims trailing zeros. Both are codegen'd built-ins.
    */
  def isoMicrosTrimmed(epochMicros: Column): Column =
    regexp_replace(
      date_format(timestamp_micros(epochMicros), "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"),
      "\\.?0+Z$",
      "Z")

  /** Snort timestamp format, Go layout "06/01/02-15:04:05.999999"
    * (internal/app/app.go:195). */
  val SnortTimestampFormat = "yy/MM/dd-HH:mm:ss.SSSSSS"

  /** Event-time parse with fallback: parse the Snort-format timestamp string;
    * if unparseable, fall back to the unix-seconds column.
    * Reference: internal/app/app.go:195-198. `try_to_timestamp` yields null on
    * parse failure (even under ANSI), which is exactly the Go fallback branch.
    */
  def eventTimeWithFallback(snortTimestamp: Column, fallbackSeconds: Column): Column =
    coalesce(
      try_to_timestamp(snortTimestamp, lit(SnortTimestampFormat)),
      timestamp_seconds(fallbackSeconds))

  /** Floor an epoch-seconds value to an n-second bucket:
    * roundTime(t, n) = (t / n) * n (integer division).
    * Reference: internal/processor/processor.go:105-107 (latent time-bucketing,
    * SURVEY.md B1). Go's `/` truncates toward zero and `%` keeps the dividend
    * sign — same as Spark's `%` — so (t/n)*n ≡ t - t%n exactly, including for
    * negative epochs, with no double-precision round-trip.
    */
  def timeBucket(epochSeconds: Column, bucketSeconds: Long): Column =
    (epochSeconds - (epochSeconds % lit(bucketSeconds))).cast("long")

  /** Lowercase-hex SHA-256 of a string — reference GetHashKeyData,
    * internal/processor/processor.go:96-103. Spark's `sha2` is already
    * lowercase hex, so this is the built-in verbatim.
    */
  def sha256Hex(c: Column): Column = sha2(c.cast("string"), 256)
}
