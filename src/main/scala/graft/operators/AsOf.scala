package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (nearest-earlier match per key) composed from built-ins
  * (SURVEY.md §2C joins row): no crossJoin, no per-row probe — a single
  * union + shuffle-by-key + in-partition sort + running last(ignoreNulls).
  *
  * Scale notes (100 TB): cost is one shuffle of (left ∪ right) on the key
  * column plus a sort within each key partition — the same shape Catalyst
  * produces for a sort-merge join, so it survives arbitrarily many keys;
  * skew is bounded by the hottest single key (saltable if needed). This
  * beats the naive `theta-join + row_number` plan, which materializes every
  * (left, earlier-right) pair before pruning.
  */
object AsOf {

  /** For each left row, attach `valueCols` from the right row with the
    * greatest `rightTime` strictly earlier than `leftTime` sharing `key`
    * (null when no earlier right row exists). Same-instant right rows are
    * NOT matched: rows sort (time asc, side asc) with left side = 0, and the
    * window frame ends one row before the current left row.
    */
  def nearestEarlier(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val otherLeft = leftCols.filterNot(_ == key)
    val valsType = org.apache.spark.sql.types.StructType(
      valueCols.map(c => right.schema(c).copy(name = c)))

    val l = left.select(
      (Seq(col(key), col(leftTime).as("__t"), lit(0).as("__side"),
        lit(null).cast(valsType).as("__vals")) ++ otherLeft.map(col)): _*)
    val r = right.select(
      (Seq(col(key), col(rightTime).as("__t"), lit(1).as("__side"),
        struct(valueCols.map(col): _*).as("__vals")) ++
        otherLeft.map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)

    // __vals as the final sort key makes the ordering total: two right rows
    // at the same (key, time) would otherwise be matched nondeterministically
    // (struct comparison is lexicographic; left rows carry null __vals and
    // sort consistently).
    val w = Window
      .partitionBy(col(key))
      .orderBy(col("__t").asc, col("__side").asc, col("__vals").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, -1)

    l.unionByName(r)
      .withColumn("__match", last(col("__vals"), ignoreNulls = true).over(w))
      .filter(col("__side") === 0)
      .select(leftCols.map(col) ++ valueCols.map(v => col(s"__match.$v").as(s"asof_$v")): _*)
  }

  /** Forward as-of: attach `valueCols` from the right row with the SMALLEST
    * `rightTime` strictly later than `leftTime` sharing `key` (null when
    * none exists). Mirror of [[nearestEarlier]]: time sorts DESCENDING, so
    * the preceding frame holds exactly the later rows and the running
    * `last(ignoreNulls)` is the nearest of them; left rows still sort
    * before right rows at the same instant, excluding same-time matches.
    * Identical scale shape: one shuffle of (left ∪ right) on the key plus
    * an in-partition sort.
    */
  def nearestLater(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val otherLeft = leftCols.filterNot(_ == key)
    val valsType = org.apache.spark.sql.types.StructType(
      valueCols.map(c => right.schema(c).copy(name = c)))

    val l = left.select(
      (Seq(col(key), col(leftTime).as("__t"), lit(0).as("__side"),
        lit(null).cast(valsType).as("__vals")) ++ otherLeft.map(col)): _*)
    val r = right.select(
      (Seq(col(key), col(rightTime).as("__t"), lit(1).as("__side"),
        struct(valueCols.map(col): _*).as("__vals")) ++
        otherLeft.map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)

    val w = Window
      .partitionBy(col(key))
      .orderBy(col("__t").desc, col("__side").asc, col("__vals").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, -1)

    l.unionByName(r)
      .withColumn("__match", last(col("__vals"), ignoreNulls = true).over(w))
      .filter(col("__side") === 0)
      .select(leftCols.map(col) ++ valueCols.map(v => col(s"__match.$v").as(s"asof_$v")): _*)
  }

  /** Nearest as-of in EITHER direction: attach `valueCols` from the right
    * row minimizing |rightTime − leftTime| over the shared `key`; on an
    * exact two-sided tie the EARLIER right row wins, and a same-instant
    * right row wins outright (distance 0). The ML-feature-join variant the
    * backward/forward forms can't express (e.g. "the sensor reading closest
    * to each label timestamp").
    *
    * Plan: the same single shuffle of (left ∪ right) on `key` + one
    * in-partition sort as [[nearestEarlier]], with TWO frames over that one
    * sort — a running `last(ignoreNulls)` up to the current row (nearest
    * earlier-or-equal) and a `first(ignoreNulls)` from the current row on
    * (nearest strictly-later; same-instant right rows sort BEFORE left rows
    * here, so they land in the backward frame only, never both). Catalyst
    * plans one Exchange + one Sort feeding both Window frames — no second
    * shuffle, no per-row probe, no quadratic pair fan-out.
    *
    * Among several right rows at one (key, time) the backward frame matches
    * the largest `valueCols` struct and the forward frame the smallest —
    * deterministic either way, but collapse the right side to one row per
    * (key, time) upstream when the two must agree (as q_join_asof_nearest
    * does). Times must be TimestampType or integral (distance is exact µs /
    * integer arithmetic — no float rounding in the tie decision).
    */
  def nearest(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val otherLeft = leftCols.filterNot(_ == key)
    val rt = right.schema(rightTime)
    val valsType = org.apache.spark.sql.types.StructType(
      rt.copy(name = "__rt") +: valueCols.map(c => right.schema(c).copy(name = c)))

    // Right rows take side 0 so a same-instant right row PRECEDES the left
    // row in the sort and is caught by the backward (≤) frame.
    val l = left.select(
      (Seq(col(key), col(leftTime).as("__t"), lit(1).as("__side"),
        lit(null).cast(valsType).as("__vals")) ++ otherLeft.map(col)): _*)
    val r = right.select(
      (Seq(col(key), col(rightTime).as("__t"), lit(0).as("__side"),
        struct((col(rightTime).as("__rt") +: valueCols.map(col)): _*).as("__vals")) ++
        otherLeft.map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)

    def micros(c: org.apache.spark.sql.Column) = rt.dataType match {
      case org.apache.spark.sql.types.TimestampType => unix_micros(c)
      case _ => c.cast("long")
    }

    val sorted = Window.partitionBy(col(key))
      .orderBy(col("__t").asc, col("__side").asc, col("__vals").asc_nulls_first)
    val back = sorted.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = sorted.rowsBetween(Window.currentRow, Window.unboundedFollowing)

    val withBoth = l.unionByName(r)
      .withColumn("__b", last(col("__vals"), ignoreNulls = true).over(back))
      .withColumn("__f", first(col("__vals"), ignoreNulls = true).over(fwd))
      .filter(col("__side") === 1)
    val db = micros(col("__t")) - micros(col("__b.__rt"))
    val df = micros(col("__f.__rt")) - micros(col("__t"))
    val pick = when(col("__b").isNull, col("__f"))
      .when(col("__f").isNull, col("__b"))
      .when(db <= df, col("__b"))
      .otherwise(col("__f"))
    withBoth
      .withColumn("__match", pick)
      .select(leftCols.map(col) ++ valueCols.map(v => col(s"__match.$v").as(s"asof_$v")): _*)
  }
}
