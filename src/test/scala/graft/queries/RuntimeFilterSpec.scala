package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Runtime bloom-filter readiness for the 100 TB star-join shape.
  *
  * At gated scale the quarter-filtered orders side of q_join_star's
  * fact-fact edge broadcasts and no runtime filter is needed. At 100 TB
  * that side exceeds any broadcast threshold, the edge becomes a shuffle
  * join, and what keeps the lineitem scan from shuffling rows that cannot
  * match is Catalyst's InjectRuntimeFilter: a bloom filter built from the
  * filtered creation side, applied AT THE FACT SCAN as
  * `might_contain(xxhash64(l_orderkey))` — semi-join reduction before the
  * exchange. This spec pins that OUR plan shape qualifies for the rule
  * under the scale-representative confs (broadcast off = the 100 TB
  * reality for this edge; application-side threshold 0 = the fact side is
  * always "big enough" locally): a declarative date-filtered join that
  * stops qualifying (e.g. a non-pushable filter, a transformed join key)
  * would silently lose the injection, and this is the regression fence.
  * Confs are restored afterwards — runtime-settable SQL confs on the
  * shared suite session.
  */
class RuntimeFilterSpec extends SparkSpec {

  test("the star-join fact edge qualifies for runtime bloom-filter injection") {
    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set(keys.head, "0")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val lineitem = spark.read.parquet(sf("sf0.01") + "/lineitem.parquet")
      val orders = spark.read.parquet(sf("sf0.01") + "/orders.parquet")
        .filter(col("o_orderdate") >= lit("1996-10-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_custkey"))
      val j = lineitem.filter(col("l_returnflag") === "R")
        .join(orders, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
      val opt = j.queryExecution.optimizedPlan.toString
      assert(opt.contains("might_contain") && opt.contains("bloom_filter_agg"),
        s"expected InjectRuntimeFilter to plant a bloom filter on the fact scan:\n${opt.take(2000)}")
      // and it must survive into the executed physical plan
      j.collect()
      assert(j.queryExecution.executedPlan.toString.contains("might_contain"),
        "bloom filter was optimized away before execution")
    } finally {
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }
}
