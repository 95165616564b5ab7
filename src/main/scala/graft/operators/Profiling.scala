package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Zero-extra-pass data-quality counters via Catalyst's CollectMetrics
  * node (`Dataset.observe`). The q_profile_* queries profile a table as a
  * JOB; these helpers profile a table as a SIDE EFFECT of the job that
  * was already running — the accumulators ride the producing tasks, so
  * the counters cost nothing at any corpus size. At 100 TB the
  * difference is a full extra scan of the corpus per quality report vs.
  * none: a curation pipeline observes its keep/drop tallies on the same
  * pass that writes the curated output.
  *
  * Only algebraic aggregates are legal inside observe() (no distinct, no
  * sort-based forms — Spark enforces this at analysis time); keep-rate
  * tallies are sums of predicates, exactly the legal shape.
  */
object Profiling {

  /** Attach total/kept/dropped tallies for `keep` to the DataFrame. The
    * metrics materialize when the RETURNED frame is consumed; read them
    * from the Observation afterwards (blocks until the action finishes).
    */
  def observeKeepRate(df: DataFrame, keep: Column, name: String): (DataFrame, Observation) = {
    val obs = Observation(name)
    val out = df.observe(obs,
      count(lit(1)).as("n_rows"),
      sum(when(keep, 1L).otherwise(0L)).as("n_keep"),
      sum(when(keep, 0L).otherwise(1L)).as("n_drop"))
    (out, obs)
  }

  /** Streaming variant — a NAMED observe (Observation handles are
    * batch-only): per-microbatch tallies surface in every
    * `StreamingQueryProgress.observedMetrics(name)`, the hook a streaming
    * quality monitor alerts from without touching the data path.
    */
  def observeKeepRateStream(df: DataFrame, keep: Column, name: String): DataFrame =
    df.observe(name,
      count(lit(1)).as("n_rows"),
      sum(when(keep, 1L).otherwise(0L)).as("n_keep"),
      sum(when(keep, 0L).otherwise(1L)).as("n_drop"))
}
