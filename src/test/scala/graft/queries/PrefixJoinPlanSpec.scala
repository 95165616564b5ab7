package graft.queries

import graft.{SparkSpec, Tables}
import graft.operators.{Dedup, TextAnalysis}
import org.apache.spark.sql.functions._

/** Contracts for `q_dedup_jaccard_prefix` (AllPairs prefix filtering):
  *
  * 1. PLAN: the candidate stage must be the inverted-index hash join of the
  *    prefix stream against the shingle stream — never a cartesian/
  *    broadcast-nested-loop product of documents (the quadratic shape the
  *    operator exists to avoid).
  * 2. COMPLETENESS at the boundary: the prefix length |s| − ceil(t·|s|) + 1
  *    is tight, so pairs sitting EXACTLY at the threshold are the ones a
  *    too-short prefix silently drops. A synthetic corpus of exact-J=0.5
  *    pairs must all survive. (The sf0.01 oracle gate proves completeness
  *    on real data; this pins the adversarial boundary.)
  */
class PrefixJoinPlanSpec extends SparkSpec {
  import spark.implicits._

  test("candidate generation is a hash join, not a cartesian product") {
    val df = AllQueries.all("q_dedup_jaccard_prefix").run(Tables(spark, sf("sf0.001")))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"prefix filtering must not plan an all-pairs product:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"prefix filtering must not plan a nested-loop product:\n$plan")
  }

  test("pairs exactly at the threshold survive the prefix filter") {
    // Each pair (2k, 2k+1) shares a 10-token head (8 common 3-shingles)
    // and diverges in a 2-token private tail (2 bridging + private
    // shingles per doc, all distinct) — shingle sets of 12 with overlap 8,
    // union 16: J = 0.5, exactly at the threshold. The brute-force check
    // below recomputes J from the actual sets, so the construction only
    // needs to LAND on the boundary, not be trusted.
    val mk = (id: Long, toks: Seq[String]) => (id, toks.mkString(" "))
    val shared = (0 until 10).map(i => s"s$i")
    val docs = (0L until 10L).flatMap { k =>
      val ta = (0 until 2).map(i => s"a${k}_$i")
      val tb = (0 until 2).map(i => s"b${k}_$i")
      Seq(mk(2 * k, shared ++ ta), mk(2 * k + 1, shared ++ tb))
    }.toDF("doc_id", "text")
    // replicate the query's pipeline on this corpus
    val thr = 0.5
    val sh = docs
      .select(col("doc_id"), Dedup.tokenHashes(TextAnalysis.tokens(col("text"))).as("__th"))
      .select(col("doc_id"), array_sort(Dedup.shingleHashesFromTokenHashes(col("__th"))).as("shd"))
    val plen = (size(col("shd")) - ceil(size(col("shd")) * thr) + 1).cast("int")
    val pref = sh.select(col("doc_id").as("a"), explode(slice(col("shd"), lit(1), plen)).as("ph"))
    val full = sh.select(col("doc_id").as("b"), explode(col("shd")).as("h"))
    val cand = pref.join(full, col("ph") === col("h") && col("a") < col("b"))
      .select(col("a"), col("b")).distinct()
    val got = cand
      .join(sh.select(col("doc_id").as("a"), col("shd").as("sa")), "a")
      .join(sh.select(col("doc_id").as("b"), col("shd").as("sb")), "b")
      .withColumn("j", Dedup.jaccard(col("sa"), col("sb")))
      .filter(col("j") >= thr)
      .select(col("a"), col("b")).as[(Long, Long)].collect().toSet
    // independent brute force over the same shingle sets
    val sets = sh.select(col("doc_id"), col("shd")).as[(Long, Seq[Long])].collect().toMap
    val want = (for {
      a <- sets.keys; b <- sets.keys if a < b
      i = sets(a).toSet.intersect(sets(b).toSet).size
      u = sets(a).toSet.union(sets(b).toSet).size
      if i.toDouble / u >= thr
    } yield (a, b)).toSet
    assert(want.nonEmpty, "the synthetic corpus must contain qualifying pairs")
    assert(got == want, s"prefix filter dropped boundary pairs: missing ${want -- got}")
  }
}
