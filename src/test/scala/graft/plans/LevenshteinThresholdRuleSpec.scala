package graft.plans

import graft.{Graft, SparkSpec}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.functions._

/** LevenshteinThresholdRule — the engine's Catalyst extension. Pins:
  * (1) the rewrite fires (the optimized plan carries the thresholded
  * kernel, not the bare one) in Filter AND Join positions; (2) semantics
  * are unchanged on the boundary cases that could betray an off-by-one
  * (distance exactly k, k±1, equal strings, nulls) — checked against the
  * same predicate evaluated WITHOUT the rule; (3) GraftExtensions
  * registers the rule for conf-based deployment.
  */
class LevenshteinThresholdRuleSpec extends SparkSpec {
  import spark.implicits._

  private def withRule[A](body: => A): A = {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ LevenshteinThresholdRule
    try body
    finally spark.experimental.extraOptimizations = prev
  }

  private val pairs = Seq(
    ("kitten", "kitten"),   // 0
    ("kitten", "sitten"),   // 1
    ("kitten", "sittin"),   // 2
    ("kitten", "sitting"),  // 3
    ("abc", "xyzabc"),      // 3 (length gap = k)
    ("a", "abcdefgh"),      // 7
    (null, "x"), ("x", null), (null.asInstanceOf[String], null))

  test("the rewrite preserves semantics on boundary distances") {
    val df = pairs.toDF("a", "b")
    for (k <- 0 to 3; op <- Seq("<=", "<", ">", ">=")) {
      val pred = expr(s"levenshtein(a, b) $op $k")
      val want = df.filter(pred).collect().map(r => (r.getString(0), r.getString(1))).toSet
      withRule {
        val got = df.filter(pred).collect().map(r => (r.getString(0), r.getString(1))).toSet
        assert(got == want, s"semantics changed for op $op k=$k")
      }
    }
  }

  test("the rewrite fires on a live Filter over a real scan, every comparison shape") {
    // parquet-backed scan: the Filter node survives optimization (local
    // relations get constant-folded before user rules run)
    val part = Graft.table(spark, sf(), "part")
    for (op <- Seq("<=", "<", ">", ">=");
         pred <- Seq(s"levenshtein(p_name, p_type) $op 3", s"3 $op levenshtein(p_name, p_type)")) {
      withRule {
        val q = part.filter(expr(pred)).select(col("p_partkey"))
        val opt = q.queryExecution.optimizedPlan.toString
        // thresholded form prints levenshtein(a#.., b#.., Some(t))
        assert(opt.matches("(?s).*levenshtein\\([^(),]+, [^(),]+, Some\\(\\d+\\)\\).*"),
          s"banded kernel missing for [$pred]:\n$opt")
      }
    }
  }

  test("the rewrite reaches join conditions") {
    val left = Seq("kitten", "mitten").toDF("a")
    val right = Seq("sitten", "bolt").toDF("b")
    withRule {
      val j = left.join(right, expr("levenshtein(a, b) <= 1"))
      val opt = j.queryExecution.optimizedPlan.toString
      assert(opt.contains("levenshtein(a#") && opt.contains(", Some(1)) >= 0"),
        s"join condition not rewritten:\n$opt")
      assert(j.collect().map(r => (r.getString(0), r.getString(1))).toSet ==
        Set(("kitten", "sitten"), ("mitten", "sitten")))
    }
  }

  test("GraftExtensions registers the rule for spark.sql.extensions deploys") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    // buildOptimizerRules is private[sql] at the Scala level but public
    // bytecode — reflect, as an extension-mechanism black-box would
    val rules = classOf[SparkSessionExtensions]
      .getMethod("buildOptimizerRules", classOf[org.apache.spark.sql.SparkSession])
      .invoke(ext, spark).asInstanceOf[Seq[AnyRef]]
    assert(rules.contains(LevenshteinThresholdRule))
  }
}
