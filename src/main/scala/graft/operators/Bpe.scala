package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING — the merge-rule induction loop
  * (Sennrich et al. 2016), the step the LLM preprocessing surface was still
  * missing ([[TextAnalysis]] covers pair COUNTING via q_text_bpe_pairs and
  * vocabulary APPLICATION via q_text_vocab_encode).
  *
  * Distributed shape, same family as [[Similarity.kmeansAssign]]'s Lloyd's
  * loop: the corpus collapses ONCE into a word-frequency table (vocab-sized —
  * bounded by distinct words, not corpus rows, so it is already tiny relative
  * to 100 TB of documents), and every merge iteration is one vocab-sized
  * Spark job whose driver traffic is a single top-1 row (the argmax pair) —
  * constant in both corpus and vocabulary size. Words are kept as
  * space-separated symbol strings; applying a merge is one codegen'd
  * `replace`, not a per-symbol array rewrite.
  *
  * Merge-application semantics are DEFINED as left-to-right non-overlapping
  * string replacement (`java.lang.String.replace` / SQL `replace`): on an odd
  * run like `a a a a` merging (a,a) yields `aa a a` — the third `a` is not
  * re-paired with the consumed second — where simultaneous-scan BPE yields
  * `aa aa`. Both engines implement exactly this replace, which is what makes
  * the merge loop oracle-EXACT; the divergence from simultaneous-scan BPE
  * only occurs on runs of 3+ identical symbols and is documented rather than
  * hidden.
  */
object Bpe {

  /** `"hello"` → `" h e l l o "` — one symbol per character, single-space
    * separated, space-padded so every symbol (incl. first/last) has the
    * ` a b ` shape a merge's `replace` pattern expects.
    */
  def spaced(word: Column): Column =
    concat(regexp_replace(word, "(.)", " $1"), lit(" "))

  /** Adjacent-symbol pair counts over `(word, f, s)`, weighted by word
    * frequency — one narrow explode + one hash aggregate, no joins.
    */
  def pairCounts(words: DataFrame): DataFrame = {
    val syms = split(trim(col("s")), " ")
    words
      .select(col("f"), syms.as("syms"))
      .filter(size(col("syms")) >= 2)
      .select(col("f"),
        explode(transform(slice(col("syms"), lit(1), size(col("syms")) - 1),
          (x, i) => struct(x.as("w1"),
            element_at(col("syms"), i + 2).as("w2")))).as("b"))
      .groupBy(col("b.w1").as("w1"), col("b.w2").as("w2"))
      .agg(sum(col("f")).as("pair_count"))
  }

  /** Induce `nMerges` merge rules from a word-frequency table `(word, f)`.
    * Returns `(merge_rank, w1, w2, merged, pair_count)`, one row per rule in
    * induction order. Ties on count break on (w1, w2) ascending, so the rule
    * sequence is deterministic under any partitioning. Each iteration
    * eagerly localCheckpoints the rewritten vocab so plan lineage stays flat
    * across iterations (the k-means lesson — and eager, so no lazy backfill
    * job races the next action).
    *
    * ==Ceiling: one Spark job per merge rank==
    * Driver TRAFFIC per merge is one row (the argmax pair) — constant in
    * corpus and vocabulary size — but driver ROUND-TRIPS are `nMerges`:
    * each rank schedules one vocab-sized job serially, because greedy BPE's
    * rank-k choice depends on the counts AFTER rank k-1 is applied (batching
    * the top-B pre-computed pairs is NOT equivalent: a merge can mint a new
    * pair — e.g. `(x, ab)` after merging `(a, b)` — whose count exceeds the
    * pre-computed rank-2 candidate, so any exact batch bound needs the very
    * recount it would skip). At the gated 5 merges, and up to a few hundred,
    * this is fine (~0.1-0.3 s/rank on a materialized vocab); at a real
    * tokenizer's 30k-100k merges it is hours of job-scheduling overhead, and
    * the right tool is a driver-side (single-node) trainer over the
    * collected word-frequency table — vocab-sized, NOT corpus-sized, so it
    * fits comfortably where the corpus never could — with [[segment]]
    * applying the learned rules distributively. The sequential-greedy
    * contract itself is pinned by BpeSpec's fuzz parity against an
    * in-memory reference trainer.
    */
  def train(wordFreq: DataFrame, nMerges: Int): DataFrame = {
    val spark = wordFreq.sparkSession
    import spark.implicits._
    var cur = wordFreq
      .select(col("word"), col("f"), spaced(col("word")).as("s"))
      .localCheckpoint(true)
    val merges =
      scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
    var m = 1
    var exhausted = false
    while (m <= nMerges && !exhausted) {
      val top = pairCounts(cur)
        .orderBy(col("pair_count").desc_nulls_last, col("w1"), col("w2"))
        .limit(1).collect()                       // constant: one row
      if (top.isEmpty) exhausted = true
      else {
        val r = top(0)
        val (w1, w2, c) = (r.getString(0), r.getString(1), r.getLong(2))
        merges += ((m, w1, w2, w1 + w2, c))
        cur = cur.withColumn("s",
            replace(col("s"), lit(s" $w1 $w2 "), lit(s" $w1$w2 ")))
          .localCheckpoint(true)
        m += 1
      }
    }
    merges.toSeq.toDF("merge_rank", "w1", "w2", "merged", "pair_count")
  }

  /** Segment a word-frequency table with an already-learned merge list:
    * apply each `(w1, w2)` rule in rank order as one codegen'd `replace`
    * (same left-to-right semantics as training), then split the spaced
    * string back into the piece array. Merges arrive as a driver-side list
    * (vocab-rule-count-sized — constant w.r.t. the corpus), so application
    * is a pure narrow map over the vocab: no joins, no shuffles.
    */
  def segment(wordFreq: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    val s0 = spaced(col("word"))
    val s = merges.foldLeft(s0) { case (acc, (w1, w2)) =>
      replace(acc, lit(s" $w1 $w2 "), lit(s" $w1$w2 "))
    }
    wordFreq.select(col("word"), col("f"), split(trim(s), " ").as("pieces"))
  }
}
