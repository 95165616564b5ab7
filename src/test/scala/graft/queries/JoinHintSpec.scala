package graft.queries

import graft.{Graft, SparkSpec}
import org.apache.spark.sql.functions._

/** Join-strategy hint fence. At 100 TB the planner's size estimates are
  * sometimes wrong in ways only the author can know (a filtered dimension
  * whose post-filter size statistics can't see; a build side that fits
  * memory despite a huge on-disk footprint), and the escape hatch is the
  * per-join strategy hint. This spec pins that all three hints actually
  * steer OUR session's planner — broadcast() forces BroadcastHashJoin on a
  * side the threshold would reject, SHUFFLE_HASH forces ShuffledHashJoin
  * (the right call when the build side fits but sorting the probe side is
  * the waste), and MERGE forces SortMergeJoin even under a
  * broadcast-friendly threshold. A regression here (conf shadowing, a
  * wrapper that drops hints) would silently strand the user with the
  * planner's guess.
  */
class JoinHintSpec extends SparkSpec {

  private def planOf(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("broadcast, shuffle-hash, and merge hints each steer the physical join") {
    val saved = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    try {
      val li = Graft.table(spark, sf(), "lineitem").select(col("l_orderkey"), col("l_quantity"))
      val ord = Graft.table(spark, sf(), "orders").select(col("o_orderkey"), col("o_custkey"))

      // broadcast() must override a disabled threshold
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val b = li.join(broadcast(ord), col("l_orderkey") === col("o_orderkey"))
      assert(planOf(b).contains("BroadcastHashJoin"),
        "broadcast() hint must force BroadcastHashJoin past a -1 threshold")

      // SHUFFLE_HASH must beat the default sort-merge preference
      val sh = li.join(ord.hint("SHUFFLE_HASH"), col("l_orderkey") === col("o_orderkey"))
      assert(planOf(sh).contains("ShuffledHashJoin"),
        "SHUFFLE_HASH hint must force ShuffledHashJoin")

      // MERGE must beat an everything-broadcasts threshold
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (512 * 1024 * 1024).toString)
      val m = li.join(ord.hint("MERGE"), col("l_orderkey") === col("o_orderkey"))
      assert(planOf(m).contains("SortMergeJoin"),
        "MERGE hint must force SortMergeJoin under a broadcast-friendly threshold")
    } finally {
      saved match {
        case Some(v) => spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
        case None    => spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      }
    }
  }
}
