package org.apache.spark.graftbridge

import org.apache.spark.TaskContext

/** Test-only bridge: a TaskContext INSTANCE to pass into RDD.compute
  * without installing it in the thread-local (TaskContext.get() stays
  * null) — the exact environment of a direct doExecute drive, where
  * IntervalJoinExec's no-task cleanup paths are the ones on duty.
  */
object TestTaskContextBridge {
  def emptyTaskContext(): TaskContext = TaskContext.empty()
}
