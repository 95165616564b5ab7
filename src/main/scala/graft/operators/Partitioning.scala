package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shuffle-management utilities for the 100 TB deployment shapes
  * (SURVEY.md §4 / builder contract "Partitioning & shuffle"):
  *
  * - `saltedAggregate`: two-phase aggregation for skewed group keys. A hot
  *   key that would pin one reducer is split across `saltBuckets` partial
  *   groups (map-side spread), then the partials combine in a second, tiny
  *   aggregation. Works for any algebraic aggregate (sum/count/min/max).
  *
  * - `saltedJoin`: skew-safe equi-join of a skewed LEFT against a small-ish
  *   RIGHT: left rows get a random-but-deterministic salt, right rows are
  *   replicated across all salts, and the join key becomes (key, salt) —
  *   the hot key's rows spread over `saltBuckets` reducers. (AQE's skew
  *   handling covers sort-merge joins automatically; this is the explicit
  *   form for when the optimizer can't see the skew, e.g. post-UDF keys.)
  *
  * Bucketed tables (`bucketBy` + `saveAsTable`) are the third leg —
  * exercised in PartitioningSpec, where a bucketed-bucketed join plans with
  * NO Exchange on either side.
  */
object Partitioning {

  /** Deterministic salt in [0, buckets) from arbitrary tiebreak columns. */
  def salt(buckets: Int, from: Column*): Column =
    pmod(hash(from: _*), lit(buckets))

  /** Two-phase skew-safe aggregation: groupBy(key) sum(valueCol) with the
    * first phase spread over (key, salt).
    */
  def saltedAggregate(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      saltBuckets: Int = 16,
      saltFrom: Seq[String] = Seq.empty): DataFrame = {
    val saltCols = if (saltFrom.nonEmpty) saltFrom.map(col) else Seq(col(valueCol))
    df.withColumn("__salt", salt(saltBuckets, saltCols: _*))
      .groupBy(col(keyCol), col("__salt"))
      .agg(sum(col(valueCol)).as("__partial"), count(lit(1)).as("__n"))
      .groupBy(col(keyCol))
      .agg(sum(col("__partial")).as(s"sum_$valueCol"), sum(col("__n")).as("n"))
  }

  /** Skew-safe equi-join: salt the skewed left, replicate the right across
    * all salt values, join on (key, salt). The salt derives from stable row
    * CONTENT (hash of `saltFrom` columns, default all left columns), never
    * from monotonically_increasing_id(): that id changes under task retry /
    * recomputation, so a re-executed partition would send the same row to a
    * different salt — results stay correct but plans and partition
    * placement stop being reproducible, which poisons debugging and any
    * downstream that assumes deterministic lineage.
    *
    * Limitation of content salting: IDENTICAL rows get identical salts, so a
    * hot key composed of full-duplicate rows gets zero spread. If that is
    * your skew shape, pass `saltFrom` naming a stable unique tiebreak column
    * (an event id, a file+offset) so duplicates still fan out — same
    * contract as `saltedAggregate.saltFrom`.
    */
  def saltedJoin(
      skewedLeft: DataFrame,
      right: DataFrame,
      key: String,
      saltBuckets: Int = 16,
      saltFrom: Seq[String] = Seq.empty): DataFrame = {
    val saltCols =
      if (saltFrom.nonEmpty) saltFrom.map(col)
      else skewedLeft.columns.map(col).toIndexedSeq
    val saltedL = skewedLeft.withColumn("__salt", salt(saltBuckets, saltCols: _*))
    val replicatedR = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    saltedL.join(replicatedR, Seq(key, "__salt")).drop("__salt")
  }
}
