package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucketed range (interval) join — the scale-safe formulation of
  * `point BETWEEN lo AND hi`.
  *
  * A raw range predicate has no equi-key, so Catalyst can only plan it as a
  * (broadcast) nested-loop join: O(|points| × |intervals|) comparisons —
  * the classic 100 TB scale-killer even when the output is small. The
  * standard fix (binned/bucketed range joins in the warehouse-engine
  * literature, e.g. the IEJoin paper's blocking stage): quantize the
  * domain into fixed-width
  * buckets, explode each interval to the buckets it overlaps, map each
  * point to its single bucket, HASH-join on the bucket id, and re-check the
  * exact predicate. Join cost becomes O(matching bucket pairs), the shuffle
  * is an ordinary hash partition on bucket id, and AQE/skew handling apply
  * as usual.
  *
  * Exactness: bucketing only needs MONOTONICITY, not precision — a point in
  * [lo, hi] always lands in one of the interval's exploded buckets, and the
  * final predicate re-check discards any same-bucket non-match. Each
  * (point, interval) match is produced exactly once (a point has exactly
  * one bucket), so no distinct pass is needed.
  *
  * Pick `bucketWidth` near the typical interval length: width ≫ interval
  * wastes re-check work (many non-matches share a bucket); width ≪ interval
  * multiplies the exploded build side (≈ len/width rows per interval).
  */
object RangeJoin {

  /** Monotone bucket id. Double division is safe here: monotonicity is all
    * correctness needs (see scaladoc), and both sides use the same
    * expression, so a boundary point and the interval that covers it can
    * never disagree by more than the explode's ±1 bucket slack.
    */
  private def bucketOf(c: Column, w: Long): Column =
    floor(c.cast("double") / w).cast("long")

  /** Join `points(pointCol)` to `intervals[loCol, hiCol]` (closed, i.e.
    * lo <= p <= hi) via bucket equi-join + exact re-check. Column names
    * must not collide between the two inputs (standard join hygiene; keep
    * `__bucket` out of both). Null points, los, or his never match, same
    * as the raw range predicate.
    */
  def pointInInterval(points: DataFrame, pointCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val iv = intervals.withColumn("__bucket",
      explode(sequence(bucketOf(col(loCol), bucketWidth),
        bucketOf(col(hiCol), bucketWidth))))
    val pt = points.withColumn("__bucket", bucketOf(col(pointCol), bucketWidth))
    pt.join(iv, Seq("__bucket"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bucket")
  }

  /** Interval × interval OVERLAP join (closed intervals: `lLo <= rHi AND
    * rLo <= lHi`) — the validity-window / concurrency primitive
    * (point-in-interval's two-sided sibling). Both sides explode to their
    * covering buckets and hash-join on bucket id; the exact predicate
    * re-checks each candidate. Exactly-once WITHOUT a distinct pass: an
    * overlapping pair shares every bucket covering the intersection, so
    * only the bucket containing `greatest(lLo, rLo)` — the intersection's
    * left edge, which both sides cover by definition — "claims" the pair
    * (the standard one-bucket-claims trick from binned spatial joins).
    * Cost is O(overlapping bucket pairs) with an ordinary hash shuffle —
    * never the nested-loop O(|L|·|R|) a raw overlap predicate plans to.
    * Column names must not collide; keep `__bucket` out of both inputs.
    */
  def intervalOverlap(left: DataFrame, lLoCol: String, lHiCol: String,
      right: DataFrame, rLoCol: String, rHiCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val l = left.withColumn("__bucket",
      explode(sequence(bucketOf(col(lLoCol), bucketWidth),
        bucketOf(col(lHiCol), bucketWidth))))
    val r = right.withColumn("__bucket",
      explode(sequence(bucketOf(col(rLoCol), bucketWidth),
        bucketOf(col(rHiCol), bucketWidth))))
    l.join(r, Seq("__bucket"))
      .filter(col(lLoCol) <= col(rHiCol) && col(rLoCol) <= col(lHiCol))
      .filter(col("__bucket") ===
        bucketOf(greatest(col(lLoCol), col(rLoCol)), bucketWidth))
      .drop("__bucket")
  }
}
