package org.apache.spark.graftbridge

import org.apache.spark.SparkEnv
import org.apache.spark.util.Utils

/** Narrow `private[spark]` bridge for core utilities the engine's
  * physical operators need — the sibling of
  * `org.apache.spark.sql.graftbridge.PlanBridge` for spark-core rather
  * than spark-sql internals. Nothing else crosses the boundary.
  */
object CoreBridge {

  /** A Spark-configured local scratch directory — `spark.local.dir`,
    * the YARN/K8s container dirs, or `SPARK_LOCAL_DIRS`, resolved by
    * Spark's own `Utils.getLocalDir` (the same resolution the block
    * manager's spill files use) — falling back to `java.io.tmpdir`
    * outside a live Spark env (bare unit tests). Executor spill files
    * belong HERE, not in java.io.tmpdir: on K8s/YARN pods /tmp is often
    * a small root volume or a tmpfs, while spark.local.dir points at the
    * provisioned scratch SSDs — a spill written to tmpfs is still RAM,
    * defeating its purpose.
    */
  def localDir(): java.io.File = {
    val env = SparkEnv.get
    val dir =
      if (env == null) System.getProperty("java.io.tmpdir")
      else Utils.getLocalDir(env.conf)
    new java.io.File(dir)
  }
}
