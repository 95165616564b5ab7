package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Clients live on the companion object: an inner class would capture the
  * (non-serializable) suite and fail closure cleaning on executors.
  */
object LookupEnrichSpec {
  class CountingClient(
      lookups: org.apache.spark.util.LongAccumulator,
      opens: org.apache.spark.util.LongAccumulator)
      extends LookupEnrich.LookupClient {
    override def open(): Unit = opens.add(1L)
    def lookup(key: String): String = { lookups.add(1L); s"geo:$key" }
  }

  class UpperClient extends LookupEnrich.LookupClient {
    def lookup(key: String): String = key.toUpperCase
  }

  class FlakyClient extends LookupEnrich.LookupClient {
    def lookup(key: String): String =
      if (key.endsWith("3")) throw new RuntimeException(s"boom:$key")
      else s"geo:$key"
  }
}

class LookupEnrichSpec extends SparkSpec {
  import LookupEnrichSpec._
  import spark.implicits._

  test("one service call per DISTINCT key, not per event (iplookup.go:28-43 shape)") {
    val lookups = spark.sparkContext.longAccumulator("test.lookups")
    val opens = spark.sparkContext.longAccumulator("test.opens")
    // 1000 events over 7 distinct IPs — the reference dedups before fan-out
    val events = (1 to 1000).map(i => (i.toLong, s"10.0.0.${i % 7}")).toDF("event_id", "src_ip")
    val enriched = LookupEnrich.enrich(events, "src_ip", "geo", new CountingClient(lookups, opens))
    val rows = enriched.select($"event_id", $"src_ip", $"geo")
      .as[(Long, String, String)].collect()
    assert(rows.length == 1000)
    assert(rows.forall { case (_, ip, geo) => geo == s"geo:$ip" })
    assert(lookups.value == 7L, s"expected 7 lookups (distinct keys), got ${lookups.value}")
    assert(opens.value <= 4L, "client opened at most once per partition")
  }

  test("null keys pass through un-enriched, without a service call") {
    val lookups = spark.sparkContext.longAccumulator("test.lookups.null")
    val opens = spark.sparkContext.longAccumulator("test.opens.null")
    val events = Seq((1L, "a"), (2L, null), (3L, "a")).toDF("event_id", "k")
    val got = LookupEnrich.enrich(events, "k", "svc", new CountingClient(lookups, opens))
      .select($"event_id", $"svc").as[(Long, Option[String])].collect().toMap
    assert(got == Map(1L -> Some("geo:a"), 2L -> None, 3L -> Some("geo:a")))
    assert(lookups.value == 1L)
  }

  test("failure policy: count-and-continue nulls the failing key; default fail-fast") {
    val failures = spark.sparkContext.longAccumulator("test.lookup.failures")
    val events = Seq((1L, "ip1"), (2L, "ip3"), (3L, "ip3"), (4L, "ip2")).toDF("event_id", "k")
    val out = LookupEnrich.enrich(events, "k", "svc", new FlakyClient, Some(failures))
    val got = out.select($"event_id", $"svc").as[(Long, Option[String])].collect().toMap
    assert(got == Map(1L -> Some("geo:ip1"), 2L -> None, 3L -> None, 4L -> Some("geo:ip2")))
    // EXACT failed-key count comes from the output (non-null key, null
    // result), not the accumulator: accumulators in transformations are
    // at-least-once under task retry, so the spec only lower-bounds it.
    val failedKeys = out.filter($"k".isNotNull && $"svc".isNull)
      .select($"k").distinct().count()
    assert(failedKeys == 1L, "one failing DISTINCT key, derived exactly from output")
    assert(failures.value >= 1L, "accumulator is an at-least-once diagnostic")
    // without an accumulator the exception propagates (fail-fast default)
    intercept[org.apache.spark.SparkException] {
      LookupEnrich.enrich(events, "k", "svc", new FlakyClient).collect()
    }
  }

  test("join-back broadcasts the looked-up relation (no event shuffle)") {
    val events = (1 to 100).map(i => (i.toLong, s"ip${i % 3}")).toDF("event_id", "src_ip")
    val plan = LookupEnrich.enrich(events, "src_ip", "geo", new UpperClient)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"expected broadcast join-back:\n$plan")
  }
}
