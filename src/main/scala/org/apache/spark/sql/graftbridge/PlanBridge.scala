package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset, SparkSession}

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
