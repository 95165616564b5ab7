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
}
