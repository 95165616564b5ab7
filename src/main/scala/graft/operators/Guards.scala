package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Runtime scale guards for operators with a documented per-group
  * super-linear step (r10 verdict task 6).
  *
  * Two catalog queries deliberately expand a bounded pair space —
  * q_ts_theil_sen (per-user day pairs: the Theil–Sen estimator IS the
  * median of all pairwise slopes) and q_events_basket_affinity (per-basket
  * type pairs: Apriori level 2). Their scaladocs state the bound
  * ("downsample long series first", "bounded by |types|² per basket"), but
  * a pathological key — one user with 10 years of daily points, one basket
  * keyed on a high-cardinality domain — would previously go O(n²) with no
  * signal. [[boundedGroups]] turns the stated precondition into an
  * enforced one: a single partial-aggregated max-group-size probe over the
  * input (the callers run it on an already-checkpointed relation, so the
  * probe re-reads materialized partitions, not the upstream pipeline; cost
  * is one O(groups) aggregate and a one-row collect) that THROWS with a
  * remediation hint instead of letting the pair join expand quietly. The
  * failure mode changes from "cluster-wide stall a shift later" to "named
  * error at the operator that owns the contract" — at 100 TB that is the
  * difference that matters.
  */
object Guards {

  /** Pass `df` through unchanged after asserting no `keys`-group exceeds
    * `cap` rows. Throws [[IllegalStateException]] naming the guard, the
    * observed maximum, and the caller-supplied remediation `hint`.
    */
  def boundedGroups(df: DataFrame, cap: Long, hint: String, keys: Column*): DataFrame = {
    val m = df.groupBy(keys: _*).agg(count(lit(1)).as("n"))
      .agg(coalesce(max(col("n")), lit(0L)).as("m"))
      .first().getLong(0)
    if (m > cap)
      throw new IllegalStateException(
        s"Guards.boundedGroups: a group of ${keys.mkString(", ")} has $m rows " +
          s"(cap $cap) — the downstream per-group pair expansion would be " +
          s"O(n²) on it. $hint")
    df
  }
}
