package graft.queries

import graft.{SparkSpec, Tables}

/** The single-pass funnel contract (r7 verdict task 2): `q_events_funnel`
  * must scan `events` once and shuffle the event stream exactly once (the
  * one groupBy(user_id) exchange), regardless of funnel depth — the old
  * chained-join form re-scanned and re-shuffled events per step. Plus the
  * window-edge semantics the sf testdata does not force: pre-signup events
  * excluded (strict >), inclusive upper bound (<= prev + 3d), and a missing
  * prior step nulling the whole chain.
  */
class FunnelPlanSpec extends SparkSpec {
  import spark.implicits._

  private def funnel(dir: String) =
    AllQueries.all("q_events_funnel").run(Tables(spark, dir))

  test("funnel scans events once and shuffles raw events exactly once") {
    val plan = funnel(sf("sf0.001")).queryExecution.executedPlan.toString
    val scans = "events\\.parquet".r.findAllIn(plan).size
    assert(scans == 1, s"expected 1 events scan, got $scans:\n$plan")
    val userShuffles = "Exchange hashpartitioning\\(user_id".r.findAllIn(plan).size
    assert(userShuffles == 1,
      s"expected exactly 1 user_id shuffle, got $userShuffles:\n$plan")
  }

  test("hot key: one user with 100k events completes without buffering the group") {
    // The r7 collect_list form buffered every view/purchase timestamp of a
    // user in one aggregation buffer — a skewed key at corpus scale is a
    // task-memory blowup. The sorted-group streaming scan keeps three longs
    // of state however large the group is; this pins that a 100k-event user
    // (none qualifying: all views precede the signup) still resolves
    // exactly, alongside normal users.
    val day = 86400L * 1000000000L
    val d0 = 1700000000L * 1000000000L
    val hot = (0 until 100000).map(i => (1L, "view", d0 + i * 1000L)) :+
      ((1L, "signup", d0 + 2 * day)) // every view is BEFORE t1 → depth 1
    val rest = Seq(
      (2L, "signup", d0), (2L, "view", d0 + day), (2L, "purchase", d0 + 2 * day),
      (3L, "view", d0))
    val dir = java.nio.file.Files.createTempDirectory("graft-funnel-hot").toString
    try {
      (hot ++ rest).toDF("user_id", "event_type", "ts")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val got = funnel(dir).as[(Int, Long)].collect().toMap
      assert(got == Map(0 -> 1L, 1 -> 1L, 3 -> 1L), s"got $got")
    } finally {
      scala.reflect.io.Path(new java.io.File(dir)).deleteRecursively()
      ()
    }
  }

  test("funnel window-edge semantics on hand-built events") {
    val day = 86400L * 1000000000L // ns
    val d0 = 1700000000L * 1000000000L
    // (user, type, ts_ns) — covers: full depth-3 chain; view-before-signup
    // ignored; view outside window; no signup at all; purchase outside its
    // window; exact-boundary view (== t1, excluded; == t1+3d, included)
    val rows = Seq(
      (1L, "signup", d0), (1L, "view", d0 + day), (1L, "purchase", d0 + 2 * day),
      (2L, "view", d0), (2L, "signup", d0 + day),
      (3L, "signup", d0), (3L, "view", d0 + 4 * day),
      (4L, "view", d0), (4L, "purchase", d0 + day),
      (5L, "signup", d0), (5L, "view", d0 + day), (5L, "purchase", d0 + 5 * day),
      (6L, "signup", d0), (6L, "view", d0), (6L, "view", d0 + 3 * day))
    val dir = java.nio.file.Files.createTempDirectory("graft-funnel").toString
    try {
      rows.toDF("user_id", "event_type", "ts")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val got = funnel(dir).as[(Int, Long)].collect().toMap
      assert(got == Map(0 -> 1L, 1 -> 2L, 2 -> 2L, 3 -> 1L), s"got $got")
    } finally {
      scala.reflect.io.Path(new java.io.File(dir)).deleteRecursively()
      ()
    }
  }
}
