package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.AttributeSet
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.plans.physical.{
  HashPartitioning, UnknownPartitioning}
import org.apache.spark.sql.classic.{Dataset, SparkSession}
import org.apache.spark.sql.execution.{LogicalRDD, SQLExecution}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Narrow `private[sql]` bridge for the engine's custom logical plans
  * (graft.plans.AsOfJoinPlan): building a DataFrame from a hand-constructed
  * LogicalPlan needs `Dataset.ofRows`, which Spark scopes to its own
  * package — the established extension-library pattern (the same door
  * spark-packages connectors use) rather than reflection. Nothing else
  * crosses the boundary: analysis, optimization, and execution all ride
  * the normal session pipeline.
  */
object PlanBridge {

  /** Wrap an already-resolved logical plan as a DataFrame on `spark`. */
  def ofRows(spark: org.apache.spark.sql.SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark.asInstanceOf[SparkSession], plan)

  /** The analyzed (attribute-resolved) plan behind a DataFrame. */
  def analyzed(df: DataFrame): LogicalPlan =
    df.asInstanceOf[Dataset[_]].queryExecution.analyzed

  /** Eager local checkpoint that records the executed plan's final HASH
    * partitioning — with AQE still ON for the materialization job.
    *
    * `Dataset.localCheckpoint(true)` records
    * `queryExecution.executedPlan.outputPartitioning` into its LogicalRDD,
    * but under AQE the executed plan is the AdaptiveSparkPlanExec wrapper,
    * which reports the default UnknownPartitioning — so every downstream
    * consumer re-shuffles the checkpoint (the r11 GraphPlanFenceSpec
    * discovery). The first fix (running the whole materialization with AQE
    * off) preserved the partitioning but cost the build job its runtime
    * broadcasts — measured 2.4× slower on the CC rounds at sf0.1. This
    * bridge keeps AQE fully on — runtime broadcasts AND partition
    * coalescing (a second attempt that scoped coalescing off paid ~0.2 s
    * of 32-tiny-task stages per checkpoint at gated scale: CC's ~8 rounds
    * went 1.8 s → 3.5 s) — and instead:
    *
    *  1. materializes the RDD exactly like Dataset.localCheckpoint(true)
    *     (row-copy → localCheckpoint → count, eager so no backfill job
    *     races a later action);
    *  2. reads the FINAL adaptive plan's outputPartitioning and records
    *     it in a hand-built LogicalRDD — but ONLY when it is a plain
    *     HashPartitioning over this plan's own output attributes with the
    *     materialized partition count; anything else (notably a coalesced
    *     shuffle read, whose row→partition map is NOT hash%n) degrades to
    *     UnknownPartitioning — correctness never rides on an optimistic
    *     claim, since a wrongly-declared partitioning would silently
    *     mis-join.
    *
    * The recording condition is scale-adaptive in exactly the right
    * direction: a user `repartition(keys)` tail is never coalesced by AQE
    * (REPARTITION_BY_COL origin), so [[graft.operators.Checkpoints
    * .partitioned]] always records; an ENSURE_REQUIREMENTS tail (e.g. a
    * closing distinct) coalesces at small scale — where saving tiny-task
    * overhead beats saving an exchange — and stays plain at the data
    * volumes where the downstream exchange is the real cost, which is
    * when the partitioning gets recorded.
    */
  def checkpointPreservingHash(df: DataFrame): DataFrame =
    checkpointPreservingHashObserved(df)._1

  /** [[checkpointPreservingHash]] that ALSO returns the plan's observed
    * metrics (`Dataset.observe` / CollectMetrics rows), read synchronously
    * off the executed plan once the materialization job finishes — no
    * listener race, no extra job. This is how an iterative operator folds
    * its convergence statistics into the checkpoint job it must run
    * anyway (ConnectedComponents' per-round probe, r19 verdict task 3):
    * the alternative — a separate probe action per round — pays one full
    * job + driver/AQE latency per round for information the
    * materialization pass already saw. Metric rows are accumulator
    * merges; task retries can only ADD, so a zero count is trustworthy
    * (the convergence checks test counts == 0).
    */
  def checkpointPreservingHashObserved(
      df: DataFrame): (DataFrame, Map[String, org.apache.spark.sql.Row]) = {
    val ds = df.asInstanceOf[Dataset[_]]
    val session = ds.sparkSession
    val qe = ds.queryExecution
    val rdd = qe.toRdd.map(_.copy())
    rdd.localCheckpoint()
    // materializes the checkpoint AND finalizes the AQE plan — under a
    // fresh SQL execution id so the job is attributed to this query in the
    // SQL UI / metrics listeners, exactly like the stock
    // Dataset.localCheckpoint(true) path this replaces (r11 ADVICE)
    SQLExecution.withNewExecutionId(qe, Some("checkpointPreservingHash")) {
      rdd.count()
    }
    val observed = org.apache.spark.sql.execution.CollectMetricsExec
      .collect(qe.executedPlan)
    val finalPlan = qe.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val out = qe.analyzed.output
    val part = finalPlan.outputPartitioning match {
      case h: HashPartitioning
          if h.references.subsetOf(AttributeSet(out)) &&
            h.numPartitions == rdd.getNumPartitions => h
      case _ => UnknownPartitioning(rdd.getNumPartitions)
    }
    // carry the optimized plan's statistics and constraints exactly like
    // Dataset.checkpoint (LogicalRDD.fromDataset) does — without them the
    // checkpoint reports defaultSizeInBytes and the static planner can
    // never broadcast it (AQE recovers at runtime, but first-attempt plans
    // and join-order choices degrade; measured +0.6 s on the bfs/sssp
    // rounds at sf0.1). Output attrs are reused verbatim from the analyzed
    // plan, so no attribute rewrite is needed.
    val stats = scala.util.Try(qe.optimizedPlan.stats).toOption
    val constraints = scala.util.Try(qe.optimizedPlan.constraints).toOption
    (Dataset.ofRows(session,
      LogicalRDD(out, rdd, part, Nil, isStreaming = false)(
        session, stats, constraints)), observed)
  }

  /** Idempotently add a planner strategy to an EXISTING session (the
    * spark.sql.extensions path only fires at session creation; callers on
    * foreign sessions — the driver's Verify, test suites — still need the
    * strategy present before planning).
    *
    * The check-then-append is synchronized on the session so two threads
    * planning their first native as-of concurrently can't each append a
    * copy (r10 ADVICE). Note a session built WITH the
    * SparkSessionExtensions registration will still gain a second,
    * experimental-list copy here — `extraStrategies` can't see
    * extension-injected strategies — which is harmless (both candidates
    * produce the same physical plan; the planner takes the first match)
    * but expected, not a bug, if observed in `experimental.extraStrategies`.
    */
  def ensureStrategy(spark: org.apache.spark.sql.SparkSession,
      strategy: org.apache.spark.sql.execution.SparkStrategy): Unit = {
    val s = spark.asInstanceOf[SparkSession]
    s.synchronized {
      if (!s.experimental.extraStrategies.contains(strategy))
        s.experimental.extraStrategies = s.experimental.extraStrategies :+ strategy
    }
  }
}
