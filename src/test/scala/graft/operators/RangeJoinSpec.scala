package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def naive(points: Seq[(Long, java.lang.Long)],
      intervals: Seq[(Long, java.lang.Long, java.lang.Long)]): Set[(Long, Long)] =
    (for {
      (pid, p) <- points if p != null
      (iid, lo, hi) <- intervals if lo != null && hi != null
      if p >= lo && p <= hi
    } yield (pid, iid)).toSet

  private def bucketed(points: Seq[(Long, java.lang.Long)],
      intervals: Seq[(Long, java.lang.Long, java.lang.Long)], w: Long): Set[(Long, Long)] =
    RangeJoin.pointInInterval(
      points.toDF("pid", "p"), "p",
      intervals.toDF("iid", "lo", "hi"), "lo", "hi", w)
      .select($"pid", $"iid").as[(Long, Long)].collect().toSet

  test("matches the naive range join, incl. boundary points and nulls") {
    val points: Seq[(Long, java.lang.Long)] =
      Seq((1L, 0L), (2L, 10L), (3L, 15L), (4L, 16L), (5L, 99L), (6L, null),
        (7L, -5L), (8L, -32L))
    val intervals: Seq[(Long, java.lang.Long, java.lang.Long)] =
      Seq((100L, 0L, 10L), (101L, 10L, 15L), (102L, 16L, 16L), (103L, 50L, 40L),
        (104L, null, 5L), (105L, 5L, null), (106L, -40L, -1L))
    for (w <- Seq(1L, 3L, 16L, 1000L))
      assert(bucketed(points, intervals, w) == naive(points, intervals), s"width $w")
  }

  test("random fuzz against the naive join at several bucket widths") {
    val rnd = new scala.util.Random(7)
    val points: Seq[(Long, java.lang.Long)] =
      Seq.tabulate(200)(i => (i.toLong, java.lang.Long.valueOf(rnd.nextInt(1000) - 500)))
    val intervals: Seq[(Long, java.lang.Long, java.lang.Long)] =
      Seq.tabulate(40) { i =>
        val lo = rnd.nextInt(1000) - 500
        (1000L + i, java.lang.Long.valueOf(lo), java.lang.Long.valueOf(lo + rnd.nextInt(60)))
      }
    val expect = naive(points, intervals)
    assert(expect.nonEmpty)
    for (w <- Seq(7L, 32L, 64L))
      assert(bucketed(points, intervals, w) == expect, s"width $w")
  }

  test("each match is produced exactly once (no bucket-overlap duplicates)") {
    // interval spanning many buckets; point inside it
    val out = RangeJoin.pointInInterval(
      Seq((1L, 500L)).toDF("pid", "p"), "p",
      Seq((9L, 0L, 1000L)).toDF("iid", "lo", "hi"), "lo", "hi", 10L)
    assert(out.count() == 1L)
  }

  test("plans as a hash join on the bucket key, not a nested loop") {
    val pts = spark.range(1000).select($"id".as("pid"), ($"id" * 3).as("p"))
    val iv = spark.range(100).select($"id".as("iid"), ($"id" * 30).as("lo"), ($"id" * 30 + 25).as("hi"))
    val plan = RangeJoin.pointInInterval(pts, "p", iv, "lo", "hi", 25L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), plan)
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"), plan)
  }

  test("interval overlap matches the naive join exactly once per pair") {
    val rnd = new scala.util.Random(13)
    val left = Seq.tabulate(120) { i =>
      val lo = rnd.nextInt(800) - 400
      (i.toLong, lo.toLong, (lo + rnd.nextInt(50)).toLong)
    }
    val right = Seq.tabulate(40) { i =>
      val lo = rnd.nextInt(800) - 400
      (1000L + i, lo.toLong, (lo + rnd.nextInt(120)).toLong)
    }
    val expect = (for {
      (lid, llo, lhi) <- left
      (rid, rlo, rhi) <- right
      if llo <= rhi && rlo <= lhi
    } yield (lid, rid)).sorted
    assert(expect.nonEmpty)
    for (w <- Seq(5L, 17L, 64L, 500L)) {
      // sorted LIST, not set: a pair emitted twice (bucket-claim bug)
      // would survive a set comparison — exactly-once is the contract.
      val got = RangeJoin.intervalOverlap(
        left.toDF("lid", "llo", "lhi"), "llo", "lhi",
        right.toDF("rid", "rlo", "rhi"), "rlo", "rhi", w)
        .select($"lid", $"rid").as[(Long, Long)].collect().toSeq.sorted
      assert(got == expect, s"width $w")
    }
  }

  test("interval overlap plans as a hash join on the bucket key") {
    val l = spark.range(500).select($"id".as("lid"), ($"id" * 5).as("llo"), ($"id" * 5 + 9).as("lhi"))
    val r = spark.range(50).select($"id".as("rid"), ($"id" * 40).as("rlo"), ($"id" * 40 + 30).as("rhi"))
    val plan = RangeJoin.intervalOverlap(l, "llo", "lhi", r, "rlo", "rhi", 16L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), plan)
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"), plan)
  }
}
