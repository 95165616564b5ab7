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
}
