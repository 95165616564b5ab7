package graft.queries

import graft.functions.Scalars
import org.apache.spark.sql.functions._

/** The reference's scalar pipeline semantics (SURVEY.md Part A) exercised
  * over the oracle-checked testdata: priority decode (A5), Go-trim ISO
  * format (A6), event-time fallback (A7), time bucketing (B1), sha256 (B2).
  * The Snort fixture pipeline itself is spec-tested (SnortPipelineSpec);
  * these queries put the same column expressions under the DuckDB gate.
  */
object PipelineQueries extends Catalog {

  def queries: Map[String, Q] = Map(
    "q_pipe_priority_decode" -> Q(
      t => t.events
        .withColumn("pri", col("event_id") % 5)
        .groupBy(Scalars.priorityLabel(col("pri")).as("priority_str"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("priority_str"), col("n")),
      Some("""SELECT CASE WHEN pri = 1 THEN 'High' WHEN pri = 2 THEN 'Medium'
                          WHEN pri = 3 THEN 'Low' ELSE 'Informational' END AS priority_str,
                     COUNT(*) AS n
              FROM (SELECT event_id % 5 AS pri FROM events)
              GROUP BY 1
              ORDER BY priority_str NULLS FIRST, n NULLS FIRST""")),

    "q_pipe_iso_trim" -> Q(
      t => t.events
        .select(
          col("event_id"),
          Scalars.isoMicrosTrimmed(unix_micros(col("ts"))).as("iso"))
        .orderBy(col("event_id"), col("iso")),
      Some("""SELECT event_id,
                     regexp_replace(strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%dT%H:%M:%S.%g'),
                                    '\.?0+$', '') || 'Z' AS iso
              FROM events
              ORDER BY event_id NULLS FIRST, iso NULLS FIRST""")),

    "q_pipe_time_bucket" -> Q(
      t => t.events
        .withColumn("bucket",
          Scalars.timeBucket(unix_timestamp(col("ts")), 900L))
        .groupBy(col("bucket"))
        // BIGINT cents (Catalog.cents): events.value is full-precision, so
        // the sum stays integer end-to-end — engine-round-proof.
        .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("sum_cents"))
        .select(
          date_format(timestamp_seconds(col("bucket")), "yyyy-MM-dd HH:mm:ss").as("bucket_ts"),
          col("n"), col("sum_cents"))
        .orderBy(col("bucket_ts"), col("n"), col("sum_cents")),
      Some("""SELECT strftime(make_timestamp(bucket * 1000000), '%Y-%m-%d %H:%M:%S') AS bucket_ts,
                     COUNT(*) AS n,
                     CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents
              FROM (SELECT CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) // 900 * 900 AS bucket,
                           value
                    FROM events)
              GROUP BY bucket
              ORDER BY bucket_ts NULLS FIRST, n NULLS FIRST, sum_cents NULLS FIRST""")),

    "q_pipe_sha256" -> Q(
      t => t.events
        .filter(col("event_id") < 200)
        .select(
          col("event_id"),
          Scalars.sha256Hex(concat(col("event_type"), lit(":"), col("user_id").cast("string"))).as("h"))
        .orderBy(col("event_id"), col("h")),
      Some("""SELECT event_id, sha256(event_type || ':' || CAST(user_id AS VARCHAR)) AS h
              FROM events WHERE event_id < 200
              ORDER BY event_id NULLS FIRST, h NULLS FIRST""")),

    // Reference B3's real enrichment shape (iplookup.go:28-43): distinct
    // keys → one client lookup per key → broadcast join-back. The fake
    // client is deterministic ('svc:' + key), so the END-TO-END result —
    // dedup, fan-out, and join-back included — sits under the DuckDB gate;
    // one-lookup-per-distinct-key is asserted in LookupEnrichSpec.
    "q_pipe_lookup_enrich" -> Q(
      t => {
        val client = new graft.operators.LookupEnrich.LookupClient {
          def lookup(key: String): String = "svc:" + key
        }
        graft.operators.LookupEnrich
          .enrich(t.events.select(col("event_id"), col("user_id")),
            "user_id", "svc", client)
          .select(col("event_id"), col("user_id"), col("svc"))
          .orderBy(col("event_id"), col("user_id"), col("svc"))
      },
      Some("""SELECT event_id, user_id,
                     'svc:' || CAST(user_id AS VARCHAR) AS svc
              FROM events
              ORDER BY event_id NULLS FIRST, user_id NULLS FIRST, svc NULLS FIRST""")),

    "q_pipe_event_time_fallback" -> Q(
      t => t.events
        .withColumn("snort_str",
          when(col("event_id") % 3 === 0, date_format(col("ts"), Scalars.SnortTimestampFormat))
            .otherwise(lit("garbage")))
        .withColumn("fallback_s", unix_timestamp(col("ts")))
        .select(
          col("event_id"),
          unix_micros(Scalars.eventTimeWithFallback(col("snort_str"), col("fallback_s"))).as("event_us"))
        .orderBy(col("event_id"), col("event_us")),
      Some("""SELECT event_id,
                     epoch_us(coalesce(
                       try_strptime(snort_str, '%y/%m/%d-%H:%M:%S.%f'),
                       make_timestamp(fallback_s * 1000000))) AS event_us
              FROM (SELECT event_id,
                           CASE WHEN event_id % 3 = 0
                                THEN strftime(CAST(ts AS TIMESTAMP), '%y/%m/%d-%H:%M:%S.%f')
                                ELSE 'garbage' END AS snort_str,
                           CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS fallback_s
                    FROM events)
              ORDER BY event_id NULLS FIRST, event_us NULLS FIRST""")))
}
