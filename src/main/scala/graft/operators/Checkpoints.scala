package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.graftbridge.PlanBridge

/** Checkpoint helpers for the iterative (superstep) operator family.
  *
  * These exist because of an AQE interaction the GraphPlanFenceSpec caught
  * in r11: `df.repartition(key).localCheckpoint(true)` does NOT preserve
  * the hash partitioning when adaptive execution is enabled.
  * `Dataset.checkpoint` records the executed plan's `outputPartitioning`
  * into the resulting `LogicalRDD` — but under AQE the executed plan is an
  * `AdaptiveSparkPlanExec`, which reports the default
  * `UnknownPartitioning(0)`, so the checkpoint forgets its layout and
  * EnsureRequirements inserts a fresh Exchange above the checkpoint scan
  * in EVERY consuming superstep join. The
  * one-upfront-shuffle-buys-K-shuffle-free-rounds contract silently
  * degraded to K+1 edge shuffles (still linear — which is why the scale
  * probes never flagged it — but K× the shuffle bytes the plan was
  * designed to pay).
  *
  * Both helpers delegate to [[PlanBridge.checkpointPreservingHash]], which
  * keeps AQE ON for the materialization job (the first attempted fix —
  * scoping AQE off around the whole materialization — preserved the
  * partitioning but cost the build its runtime broadcasts: measured 2.4×
  * slower on the CC rounds at sf0.1) and records the final adaptive
  * plan's HashPartitioning into a hand-built LogicalRDD, degrading safely
  * to UnknownPartitioning when the final layout is anything else. See the
  * bridge's scaladoc for the mechanics.
  */
object Checkpoints {

  /** `df.repartition(n, keys)` + eager localCheckpoint, with the hash
    * partitioning actually preserved into the checkpoint (see object doc).
    * Use for any relation consumed by multiple per-round joins on `keys`.
    * The partition count is pinned to the session's shuffle width
    * explicitly because a count-less `repartition(keys)` carries the
    * REPARTITION_BY_COL shuffle origin, which AQE's
    * CoalesceShufflePartitions MAY coalesce — and a coalesced layout
    * cannot be recorded (the bridge would fall back to
    * UnknownPartitioning, losing the whole point); REPARTITION_BY_NUM is
    * never coalesced, so the recorded partitioning always survives.
    */
  def partitioned(df: DataFrame, keys: Column*): DataFrame = {
    val n = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    preserving(df.repartition(n, keys: _*))
  }

  /** Eager localCheckpoint that records whatever hash partitioning the
    * plan already ends with (e.g. from a trailing `distinct()` or
    * aggregate) instead of AQE's UnknownPartitioning — the
    * zero-extra-shuffle sibling of [[partitioned]] for plans whose tail
    * exchange is already on the key downstream consumers join on
    * (ConnectedComponents' per-round edge set, (u, v) from its closing
    * distinct, consumed by the (u, v) convergence probe join).
    */
  def preserving(df: DataFrame): DataFrame =
    PlanBridge.checkpointPreservingHash(df)

  /** [[preserving]] that also returns the plan's observed metrics
    * (`Dataset.observe` rows), read off the executed plan after the
    * materialization job — the hook that lets an iterative operator fold
    * its per-round convergence statistics into the checkpoint job it
    * already pays for, instead of running a separate probe action
    * (ConnectedComponents, r19). Keyed by observation name.
    */
  def preservingObserved(
      df: DataFrame): (DataFrame, Map[String, org.apache.spark.sql.Row]) =
    PlanBridge.checkpointPreservingHashObserved(df)
}
