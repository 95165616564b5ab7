package graft.operators

import graft.SparkSpec

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  test("nearestEarlier: greatest strictly-earlier match; null when none") {
    val l = Seq((1L, 7L, 10L), (1L, 8L, 20L), (1L, 9L, 30L)).toDF("k", "eid", "t")
    val r = Seq((1L, 100L, 15L), (1L, 200L, 25L)).toDF("k", "rid", "t")
    val got = AsOf.nearestEarlier(l, r, "k", "t", "t", Seq("rid"))
      .select($"eid", $"asof_rid").as[(Long, Option[Long])].collect().toMap
    assert(got == Map(7L -> None, 8L -> Some(100L), 9L -> Some(200L)))
  }

  test("nearestLater: smallest strictly-later match; null when none") {
    val l = Seq((1L, 7L, 10L), (1L, 8L, 20L), (1L, 9L, 30L)).toDF("k", "eid", "t")
    val r = Seq((1L, 100L, 15L), (1L, 200L, 25L)).toDF("k", "rid", "t")
    val got = AsOf.nearestLater(l, r, "k", "t", "t", Seq("rid"))
      .select($"eid", $"asof_rid").as[(Long, Option[Long])].collect().toMap
    assert(got == Map(7L -> Some(100L), 8L -> Some(200L), 9L -> None))
  }

  test("same-instant right rows never match, in either direction") {
    val l = Seq((1L, 7L, 10L)).toDF("k", "eid", "t")
    val r = Seq((1L, 100L, 10L)).toDF("k", "rid", "t")
    val e = AsOf.nearestEarlier(l, r, "k", "t", "t", Seq("rid"))
      .select($"asof_rid").as[Option[Long]].collect()
    val f = AsOf.nearestLater(l, r, "k", "t", "t", Seq("rid"))
      .select($"asof_rid").as[Option[Long]].collect()
    assert(e.toSeq == Seq(None) && f.toSeq == Seq(None))
  }

  test("ties between right rows at the same time resolve deterministically") {
    val l = Seq((1L, 7L, 20L)).toDF("k", "eid", "t")
    val r = Seq((1L, 100L, 10L), (1L, 200L, 10L)).toDF("k", "rid", "t")
    // both directions: repeated evaluation returns the same winner
    val winners = (1 to 3).map { _ =>
      AsOf.nearestEarlier(l, r, "k", "t", "t", Seq("rid"))
        .select($"asof_rid").as[Long].collect().head
    }
    assert(winners.distinct.size == 1)
    // ordering is (time, side, vals asc) with last() → max vals wins
    assert(winners.head == 200L)
  }

  test("keys never mix: a right row under another key is invisible") {
    val l = Seq((1L, 7L, 20L)).toDF("k", "eid", "t")
    val r = Seq((2L, 100L, 10L)).toDF("k", "rid", "t")
    val got = AsOf.nearestEarlier(l, r, "k", "t", "t", Seq("rid"))
      .select($"asof_rid").as[Option[Long]].collect()
    assert(got.toSeq == Seq(None))
  }

  test("nearest: picks the closer side; earlier wins exact two-sided ties") {
    // eid 7: earlier at d=1 vs later at d=4 → earlier (100)
    // eid 8: earlier at d=5 vs later at d=5 → tie → earlier (200)
    // eid 9: nothing earlier, later at d=1 → later (200)
    val l = Seq((1L, 7L, 16L), (1L, 8L, 25L), (2L, 9L, 9L)).toDF("k", "eid", "t")
    val r = Seq((1L, 100L, 15L), (1L, 200L, 20L), (1L, 300L, 30L), (2L, 200L, 10L))
      .toDF("k", "rid", "t")
    val got = AsOf.nearest(l, r, "k", "t", "t", Seq("rid"))
      .select($"eid", $"asof_rid").as[(Long, Option[Long])].collect().toMap
    assert(got == Map(7L -> Some(100L), 8L -> Some(200L), 9L -> Some(200L)))
  }

  test("nearest: a same-instant right row wins outright at distance 0") {
    val l = Seq((1L, 7L, 10L)).toDF("k", "eid", "t")
    val r = Seq((1L, 100L, 10L), (1L, 200L, 11L)).toDF("k", "rid", "t")
    val got = AsOf.nearest(l, r, "k", "t", "t", Seq("rid"))
      .select($"asof_rid").as[Long].collect()
    assert(got.toSeq == Seq(100L))
  }

  test("nearest: null when the key has no right rows at all") {
    val l = Seq((1L, 7L, 10L)).toDF("k", "eid", "t")
    val r = Seq((2L, 100L, 10L)).toDF("k", "rid", "t")
    val got = AsOf.nearest(l, r, "k", "t", "t", Seq("rid"))
      .select($"asof_rid").as[Option[Long]].collect()
    assert(got.toSeq == Seq(None))
  }

  test("nearest: one shuffle — both direction frames share a single sort") {
    val l = Seq((1L, 7L, 18L)).toDF("k", "eid", "t")
    val r = Seq((1L, 100L, 15L)).toDF("k", "rid", "t")
    val plan = AsOf.nearest(l, r, "k", "t", "t", Seq("rid"))
      .queryExecution.executedPlan.toString
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
    val sorts = "\\bSort \\[".r.findAllIn(plan).size
    assert(shuffles == 1, s"expected 1 key exchange, got $shuffles:\n$plan")
    assert(sorts == 1, s"expected 1 in-partition sort, got $sorts:\n$plan")
  }
}
