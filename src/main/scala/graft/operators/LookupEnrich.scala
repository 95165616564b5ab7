package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** External-service enrichment — the reference's actual IP-lookup shape
  * (internal/iplookup/iplookup.go:28-43): it dedups the key set FIRST, calls
  * the lookup service once per DISTINCT key, then attaches results back to
  * every event. `StreamOps.enrichWithStatic` covers the broadcast-dim-table
  * form; this operator covers enriching against a SERVICE:
  *
  *   distinct(keys) → mapPartitions(client calls, one per key, connection
  *   reused per partition) → broadcast join-back onto the events.
  *
  * Scale shape (100 TB): the fan-out cost is |distinct keys| service calls,
  * not |events| — the whole point of the reference's dedup — and the result
  * relation is small enough to broadcast, so the events never shuffle.
  * Client lifecycle is per-partition (open once, look up each key, close),
  * the seam where a real HTTP/gRPC connection pool plugs in; no HTTP client
  * exists in this image, so specs use an in-process fake
  * (LookupEnrichSpec asserts exactly one lookup per distinct key).
  */
object LookupEnrich {

  /** Per-partition client: `open()` once per partition, `lookup` once per
    * distinct key, `close()` before the partition ends. Implementations
    * must be serializable (constructed driver-side, invoked on executors).
    */
  trait LookupClient extends Serializable {
    def open(): Unit = ()
    def lookup(key: String): String
    def close(): Unit = ()
  }

  /** Enrich `df` with `resultCol = client.lookup(keyCol)`, calling the
    * service once per distinct key. Null keys pass through un-enriched
    * (left join), mirroring the reference's skip of empty addresses.
    *
    * Failure policy: by default a lookup exception propagates (fail-fast).
    * Pass `failures` to count-and-continue instead — a failing key enriches
    * to null (the left join already tolerates it) and increments the
    * accumulator, mirroring the reference's failed-event accounting and this
    * repo's own decode path (ProtobufWire.decodeFramed): one bad key must
    * not kill a 100 TB enrichment job.
    *
    * The `failures` count is AT-LEAST-ONCE, like every Spark accumulator
    * incremented inside a transformation: a retried or speculatively
    * executed task re-counts its partition's failures (the reference's
    * failed-event counters carry the same caveat). Treat it as a
    * diagnostic. For an EXACT count, derive it from the output instead —
    * rows whose key is non-null but whose `resultCol` is null are precisely
    * the failed keys: `out.filter(col(keyCol).isNotNull &&
    * col(resultCol).isNull)` — which is what the spec asserts on.
    */
  def enrich(df: DataFrame, keyCol: String, resultCol: String,
      client: LookupClient,
      failures: Option[org.apache.spark.util.LongAccumulator] = None): DataFrame = {
    val keyed = df.withColumn("__lookup_key", col(keyCol).cast("string"))
    val outSchema = StructType(Seq(
      StructField("__lookup_key", StringType, nullable = false),
      StructField(resultCol, StringType, nullable = true)))
    implicit val enc: org.apache.spark.sql.Encoder[Row] =
      org.apache.spark.sql.Encoders.row(outSchema)
    val looked = keyed.select(col("__lookup_key"))
      .filter(col("__lookup_key").isNotNull)
      .distinct()
      .mapPartitions { it =>
        client.open()
        try {
          // materialize before close(): the returned iterator must not
          // touch a closed client
          val out = it.map { r =>
            val k = r.getString(0)
            val v = failures match {
              case None => client.lookup(k)
              case Some(acc) =>
                try client.lookup(k)
                catch { case scala.util.control.NonFatal(_) => acc.add(1L); null }
            }
            Row(k, v)
          }.toVector
          out.iterator
        } finally client.close()
      }
    keyed.join(broadcast(looked), Seq("__lookup_key"), "left")
      .drop("__lookup_key")
  }
}
