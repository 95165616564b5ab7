package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomPrefilterSpec extends SparkSpec {

  private def lineitem = spark.read.parquet(s"${sf()}/lineitem.parquet")
  private def supplier = spark.read.parquet(s"${sf()}/supplier.parquet")

  private def dimKeys = supplier
    .filter(col("s_nationkey") % 5 === 3)
    .select(col("s_suppkey"))

  test("prefilter admits every joinable row and only bounded extras") {
    val total = lineitem.count()
    val joinable = lineitem
      .join(dimKeys, col("l_suppkey") === col("s_suppkey"), "left_semi")
      .count()
    val passed = BloomPrefilter
      .prefilter(lineitem, "l_suppkey", dimKeys, expectedItems = 10000L)
      .count()
    // No false negatives: everything that joins must pass.
    assert(passed >= joinable)
    // Effectiveness: the pass-through must be a real cut of the fact side,
    // not a no-op (the nation%5 slice keeps ~1/5 of suppliers; default
    // fpp 3% adds at most a few percent of total).
    assert(passed < total)
    assert(passed - joinable <= (total * 0.05).toLong,
      s"false-positive overhang too large: passed=$passed joinable=$joinable total=$total")
  }

  test("prefiltered join is row-identical to the plain join") {
    val pre = BloomPrefilter
      .prefilter(lineitem, "l_suppkey", dimKeys, expectedItems = 10000L)
      .join(supplier.filter(col("s_nationkey") % 5 === 3),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("l_orderkey"), col("l_linenumber"), col("s_suppkey"))
    val plain = lineitem
      .join(supplier.filter(col("s_nationkey") % 5 === 3),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("l_orderkey"), col("l_linenumber"), col("s_suppkey"))
    assert(pre.exceptAll(plain).isEmpty && plain.exceptAll(pre).isEmpty)
  }

  test("plan fence: scalar-subquery bloom probe sits on the fact scan") {
    val pre = BloomPrefilter.prefilter(lineitem, "l_suppkey", dimKeys, 10000L)
    val plan = pre.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      s"expected a might_contain probe in the physical plan:\n$plan")
    // The probe must be a Filter over the scan, not a join: exactly one
    // scan of lineitem feeds it and no join node exists in this fragment.
    assert(!plan.contains("Join"), s"bloom probe must not plan as a join:\n$plan")
  }
}
