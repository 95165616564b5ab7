package graft.plans

import graft.SparkSpec
import graft.operators.AsOf
import org.apache.spark.sql.functions._

/** Native as-of join (AsOfJoinPlan → AsOfJoinStrategy → AsOfJoinExec) —
  * the engine's whole-operator Catalyst extension. Pins: row-for-row
  * parity with the composed union+window form on real testdata, the
  * physical shape (AsOfJoinExec present, no Window/Union in the plan),
  * strict-earlier + tie semantics on hand-built frames, and the
  * no-match null path.
  */
class AsOfNativeSpec extends SparkSpec {
  import spark.implicits._

  private def events = graft.Graft.table(spark, sf(), "events")

  private def purchases = events
    .filter($"event_type" === "purchase")
    .groupBy($"user_id", $"ts")
    .agg(max($"event_id").as("event_id"))

  test("native exec matches the composed union+window form on real data") {
    val l = events.select($"event_id", $"user_id", $"ts")
    val composed = AsOf.nearestEarlier(l, purchases,
        key = "user_id", leftTime = "ts", rightTime = "ts",
        valueCols = Seq("event_id"))
      .select($"event_id", $"asof_event_id")
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).sortBy(_._1)
    val native = NativeAsOf.backward(l, purchases,
        key = "user_id", leftTime = "ts", rightTime = "ts",
        valueCols = Seq("event_id"))
      .select($"event_id", $"asof_event_id")
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).sortBy(_._1)
    assert(native.length == composed.length && native.length > 0)
    assert(native.sameElements(composed))
  }

  test("physical plan is the native exec: no Window, no Union") {
    val df = NativeAsOf.backward(
      events.select($"event_id", $"user_id", $"ts"), purchases,
      key = "user_id", leftTime = "ts", rightTime = "ts",
      valueCols = Seq("event_id"))
    df.collect() // force final adaptive plan
    val plan = df.queryExecution.executedPlan.toString
    // SparkPlan.nodeName strips the Exec suffix: the node prints "AsOfJoin"
    assert(plan.contains("AsOfJoin"), s"native exec missing:\n$plan")
    assert(!plan.contains("Window") && !plan.contains("Union"),
      s"composed-form machinery leaked into the native plan:\n$plan")
  }

  test("strict-earlier, tie, and no-match semantics on a hand-built frame") {
    val l = Seq((1L, 100L, 1L), (1L, 200L, 2L), (2L, 50L, 3L), (3L, 10L, 4L))
      .toDF("user_id", "t", "event_id")
    // user 1: quotes at 100 (same instant as left t=100 — must NOT match
    // it) and two TIED quotes at 150 (greater value wins); user 9 noise
    val r = Seq((1L, 100L, 10L), (1L, 150L, 21L), (1L, 150L, 22L),
      (9L, 1L, 99L)).toDF("user_id", "t", "v")
    val got = NativeAsOf.backward(l, r, key = "user_id",
        leftTime = "t", rightTime = "t", valueCols = Seq("v"))
      .select($"event_id", $"asof_v")
      .collect().map(row => row.getLong(0) -> Option(row.get(1))).toMap
    assert(got(1L) == None)            // same-instant quote excluded
    assert(got(2L) == Some(22L))       // tie at 150: greatest value tuple
    assert(got(3L) == None)            // user 2: no quotes at all
    assert(got(4L) == None)            // user 3: no quotes at all
  }

  test("forward native exec matches the composed nearestLater form on real data") {
    val l = events.select($"event_id", $"user_id", $"ts")
    val composed = AsOf.nearestLater(l, purchases,
        key = "user_id", leftTime = "ts", rightTime = "ts",
        valueCols = Seq("event_id"))
      .select($"event_id", $"asof_event_id")
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).sortBy(_._1)
    val native = NativeAsOf.forward(l, purchases,
        key = "user_id", leftTime = "ts", rightTime = "ts",
        valueCols = Seq("event_id"))
      .select($"event_id", $"asof_event_id")
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).sortBy(_._1)
    assert(native.length == composed.length && native.length > 0)
    assert(native.sameElements(composed))
  }

  test("forward strict-later, tie, and shared-match semantics on a hand-built frame") {
    val l = Seq((1L, 100L, 1L), (1L, 150L, 2L), (1L, 400L, 3L), (2L, 50L, 4L))
      .toDF("user_id", "t", "event_id")
    // user 1: TIED quotes at 300 (greatest value wins), a same-instant
    // quote at 150 (must NOT match left t=150), nothing after 400
    val r = Seq((1L, 150L, 10L), (1L, 300L, 21L), (1L, 300L, 22L),
      (9L, 999L, 99L)).toDF("user_id", "t", "v")
    val got = NativeAsOf.forward(l, r, key = "user_id",
        leftTime = "t", rightTime = "t", valueCols = Seq("v"))
      .select($"event_id", $"asof_v")
      .collect().map(row => row.getLong(0) -> Option(row.get(1))).toMap
    assert(got(1L) == Some(10L))       // next after 100 is the 150 quote
    assert(got(2L) == Some(22L))       // strictly later: 300; tie → 22
    assert(got(3L) == None)            // nothing after 400
    assert(got(4L) == None)            // user 2: no quotes
  }

  test("nearest native exec matches the composed two-frame form on real data") {
    val l = events.select($"event_id", $"user_id", $"ts")
    val composed = AsOf.nearest(l, purchases,
        key = "user_id", leftTime = "ts", rightTime = "ts",
        valueCols = Seq("event_id"))
      .select($"event_id", $"asof_event_id")
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).sortBy(_._1)
    val native = NativeAsOf.nearest(l, purchases,
        key = "user_id", leftTime = "ts", rightTime = "ts",
        valueCols = Seq("event_id"))
      .select($"event_id", $"asof_event_id")
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).sortBy(_._1)
    assert(native.length == composed.length && native.length > 0)
    assert(native.sameElements(composed))
  }

  test("nearest semantics: two-sided tie to earlier, same-instant wins outright") {
    val l = Seq((1L, 200L, 1L), (1L, 300L, 2L), (1L, 105L, 3L))
      .toDF("user_id", "t", "v" /* unused */).toDF("user_id", "t", "event_id")
    // quotes: 100 and 300 → left t=200 is an exact two-sided tie (earlier
    // 100 wins); left t=300 has a same-instant quote (wins at distance 0);
    // left t=105 is nearer to 100 than 300
    val r = Seq((1L, 100L, 10L), (1L, 300L, 30L)).toDF("user_id", "t", "v")
    val got = NativeAsOf.nearest(l, r, key = "user_id",
        leftTime = "t", rightTime = "t", valueCols = Seq("v"))
      .select($"event_id", $"asof_v")
      .collect().map(row => row.getLong(0) -> Option(row.get(1))).toMap
    assert(got(1L) == Some(10L)) // |200-100| == |300-200| → earlier wins
    assert(got(2L) == Some(30L)) // same instant, distance 0
    assert(got(3L) == Some(10L)) // plain nearer-earlier
  }

  test("SQL null semantics: null keys/times match nothing, left rows kept") {
    // left: a null-key row, a null-time row, and a normal row per mode;
    // right: a null-key row and a null-time row that must match NOTHING
    // (natural nulls-first ordering would otherwise pair the null keys),
    // plus one real quote. The r11 guards: right-side IsNotNull filter +
    // left-null → null-match emission in the merge (previously forward
    // matched a null left time to the key's first right row and nearest
    // threw from the distance arithmetic).
    def jl(x: java.lang.Long) = x
    val l = Seq(
      (jl(null), jl(100L), 1L),   // null key
      (jl(1L), jl(null), 2L),     // null time
      (jl(1L), jl(200L), 3L))     // real: backward→10, forward→30, nearest→10
      .toDF("user_id", "t", "event_id")
    val r = Seq(
      (jl(null), jl(50L), 77L),   // null key: matches nothing
      (jl(1L), jl(null), 88L),    // null time: matches nothing
      (jl(1L), jl(150L), 10L),
      (jl(1L), jl(300L), 30L)).toDF("user_id", "t", "v")
    for ((mode, want3) <- Seq(
        ("backward", Some(10L)), ("forward", Some(30L)), ("nearest", Some(10L)))) {
      val f = mode match {
        case "backward" => NativeAsOf.backward _
        case "forward" => NativeAsOf.forward _
        case _ => NativeAsOf.nearest _
      }
      val got = f(l, r, "user_id", "t", "t", Seq("v"))
        .select($"event_id", $"asof_v")
        .collect().map(row => row.getLong(0) -> Option(row.get(1))).toMap
      assert(got.size == 3, s"$mode must keep all left rows")
      assert(got(1L) == None, s"$mode: null left key must match nothing")
      assert(got(2L) == None, s"$mode: null left time must match nothing")
      assert(got(3L) == want3, s"$mode: real row got ${got(3L)}")
    }
  }

  test("nearest rejects non-integral time columns at plan construction") {
    val l = Seq((1L, "a", 1L)).toDF("user_id", "t", "event_id")
    val r = Seq((1L, "b", 10L)).toDF("user_id", "t", "v")
    val e = intercept[IllegalArgumentException] {
      NativeAsOf.nearest(l, r, "user_id", "t", "t", Seq("v"))
    }
    assert(e.getMessage.contains("nearest as-of"))
    assert(e.getMessage.contains("StringType"))
  }

  test("cross-side key/time type mismatches are rejected at construction") {
    val l = Seq((1L, 100L, 1L)).toDF("user_id", "t", "event_id")
    val rIntKey = Seq((1, 100L, 10L)).toDF("user_id", "t", "v")
    val keyErr = intercept[IllegalArgumentException] {
      NativeAsOf.backward(l, rIntKey, "user_id", "t", "t", Seq("v"))
    }
    assert(keyErr.getMessage.contains("key types differ"))
    val rIntTime = Seq((1L, 100, 10L)).toDF("user_id", "t", "v")
    val timeErr = intercept[IllegalArgumentException] {
      NativeAsOf.backward(l, rIntTime, "user_id", "t", "t", Seq("v"))
    }
    assert(timeErr.getMessage.contains("time types differ"))
  }

  test("tolerance native exec matches the composed tolerance form on real data") {
    // same 2h µs bound as q_join_asof_tolerance; parity row-for-row
    // against the composed nearestEarlier + freshness null-out
    val TolUs = 2L * 3600 * 1000000
    val l = events.select($"event_id", $"user_id", $"ts")
    val fresh = unix_micros($"ts") - unix_micros($"asof_pts") <= TolUs
    val composed = AsOf.nearestEarlier(l,
        purchases.select($"user_id", $"ts", $"event_id".as("pid"), $"ts".as("pts")),
        key = "user_id", leftTime = "ts", rightTime = "ts",
        valueCols = Seq("pid", "pts"))
      .select($"event_id", when(fresh, $"asof_pid").as("pid"))
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).sortBy(_._1)
    val native = NativeAsOf.backwardTolerance(l,
        purchases.select($"user_id", $"ts", $"event_id".as("pid"), $"ts".as("pts")),
        key = "user_id", leftTime = "ts", rightTime = "ts",
        valueCols = Seq("pid", "pts"), tolerance = TolUs)
      .select($"event_id", $"asof_pid".as("pid"))
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).sortBy(_._1)
    assert(native.length == composed.length && native.length > 0)
    assert(native.sameElements(composed))
    // the bound must actually bite on this data: some rows matched
    // unbounded but fresh-nulled (otherwise this case pins nothing)
    val unbounded = NativeAsOf.backward(l,
        purchases.select($"user_id", $"ts", $"event_id".as("pid"), $"ts".as("pts")),
        key = "user_id", leftTime = "ts", rightTime = "ts",
        valueCols = Seq("pid", "pts"))
      .select($"event_id", $"asof_pid")
      .collect().count(r => !r.isNullAt(1))
    assert(native.count(_._2.isDefined) < unbounded,
      "tolerance never fired on real data - widen the test window")
  }

  test("tolerance boundary and tie semantics on a hand-built frame") {
    // tol = 50: match at distance exactly 50 KEPT (inclusive), 51 nulled;
    // the (key,time) tie still resolves to the greatest value tuple first,
    // THEN freshness applies to the winner
    val l = Seq((1L, 100L, 1L), (1L, 200L, 2L), (1L, 201L, 5L), (2L, 300L, 3L))
      .toDF("user_id", "t", "event_id")
    val r = Seq((1L, 50L, 10L), (1L, 150L, 21L), (1L, 150L, 22L),
      (2L, 100L, 30L)).toDF("user_id", "t", "v")
    val got = NativeAsOf.backwardTolerance(l, r, key = "user_id",
        leftTime = "t", rightTime = "t", valueCols = Seq("v"), tolerance = 50L)
      .select($"event_id", $"asof_v")
      .collect().map(row => row.getLong(0) -> Option(row.get(1))).toMap
    assert(got(1L) == Some(10L))  // distance exactly 50: inclusive bound
    assert(got(2L) == Some(22L))  // tie at 150 → 22 wins; distance 50: kept
    assert(got(5L) == None)       // same winner, distance 51: stale ⇒ null
    assert(got(3L) == None)       // 300-100=200 > 50: stale ⇒ null
  }

  test("tolerance rejects non-integral time columns at plan construction") {
    val l = Seq((1L, "a", 1L)).toDF("user_id", "t", "event_id")
    val r = Seq((1L, "b", 10L)).toDF("user_id", "t", "v")
    val e = intercept[IllegalArgumentException] {
      NativeAsOf.backwardTolerance(l, r, "user_id", "t", "t", Seq("v"), 10L)
    }
    assert(e.getMessage.contains("tolerance-bounded as-of"))
    assert(e.getMessage.contains("StringType"))
  }

  test("composed form agrees on the hand-built frame (shared truth)") {
    val l = Seq((1L, 100L, 1L), (1L, 200L, 2L), (2L, 50L, 3L), (3L, 10L, 4L))
      .toDF("user_id", "t", "event_id")
    val r = Seq((1L, 100L, 10L), (1L, 150L, 21L), (1L, 150L, 22L),
      (9L, 1L, 99L)).toDF("user_id", "t", "v")
    val got = AsOf.nearestEarlier(l, r, key = "user_id",
        leftTime = "t", rightTime = "t", valueCols = Seq("v"))
      .select($"event_id", $"asof_v")
      .collect().map(row => row.getLong(0) -> Option(row.get(1))).toMap
    assert(got(1L) == None && got(2L) == Some(22L) &&
      got(3L) == None && got(4L) == None)
  }
}
