package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class CurationQueriesSpec extends SparkSpec {

  private def t = Tables(spark, sf())

  test("boilerplate removal drops a non-degenerate fraction and preserves segment order") {
    val out = CurationQueries.queries("q_dedup_boilerplate").run(t).cache()
    try {
      val docs = t.documents.count()
      val kept = out.count()
      assert(kept > 0 && kept <= docs)

      val agg = out.agg(
        sum(col("n_kept")).as("k"),
        sum(col("n_total")).as("n")).head()
      val (k, n) = (agg.getLong(0), agg.getLong(1))
      // The W/threshold choice must actually fire without nuking the corpus:
      // a 0% or >50% drop rate would make the query a no-op or a shredder.
      assert(k < n, s"nothing dropped (k=$k n=$n)")
      assert(k.toDouble / n > 0.5, s"dropped more than half (k=$k n=$n)")

      // Reassembly order: a doc with zero dropped segments must round-trip
      // to its whitespace-normalized original text.
      val intact = out.filter(col("n_kept") === col("n_total"))
        .join(t.documents, "doc_id")
        .withColumn("norm", regexp_replace(trim(col("text")), "\\s+", " "))
      assert(intact.limit(1).count() == 1, "expected at least one intact doc")
      assert(intact.filter(col("clean_text") =!= col("norm")).count() == 0)

      // Every doc with a dropped segment shrank, none grew.
      assert(out.filter(col("n_kept") > col("n_total")).count() == 0)
    } finally out.unpersist()
  }

  test("redaction masks every payload digit and pseudonymizes stably") {
    val out = CurationQueries.queries("q_text_redact").run(t)
    val joined = out.join(t.events.select(col("event_id"), col("user_id")), "event_id").cache()
    try {
      // No digit may survive outside the trailing hex pseudonym.
      val payload = regexp_extract(col("redacted"), "^(.*) user=u:[0-9a-f]{8}$", 1)
      assert(joined.filter(payload === "").count() == 0, "redacted shape mismatch")
      assert(joined.filter(payload.rlike("[0-9]")).count() == 0, "digit leaked past mask")

      // Same user id -> same pseudonym; different ids -> different pseudonyms
      // (8 hex chars over the testdata user count: collisions would show up
      // as n_pseudo < n_user).
      val stable = joined.groupBy(col("user_id"))
        .agg(countDistinct(col("user_pseudo")).as("np"))
      assert(stable.filter(col("np") =!= 1).count() == 0)
      val counts = joined.agg(
        countDistinct(col("user_id")).as("nu"),
        countDistinct(col("user_pseudo")).as("np")).head()
      assert(counts.getLong(0) == counts.getLong(1))
    } finally joined.unpersist()
  }

  test("source quota keeps at most the cap per source and pre-prunes map-side") {
    val out = CurationQueries.queries("q_curate_source_quota").run(t).cache()
    try {
      val per = out.groupBy(col("source")).agg(
        count(lit(1)).as("n"), max(col("rnk")).as("mx"))
      assert(per.filter(col("n") > 5 || col("mx") > 5).count() == 0)
      assert(out.count() > 0)

      // The rank<=k filter must reach the physical plan as WindowGroupLimit
      // so each map task prunes to its local top-k BEFORE the shuffle —
      // the property that keeps a hot domain from flooding one reducer.
      val plan = out.queryExecution.executedPlan.toString
      assert(plan.contains("WindowGroupLimit"), s"no WindowGroupLimit in:\n$plan")
    } finally out.unpersist()
  }
}
