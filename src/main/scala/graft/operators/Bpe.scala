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
    * the right tool is [[trainLocal]] — the driver-side trainer over the
    * collected word-frequency table (vocab-sized, NOT corpus-sized, so it
    * fits comfortably where the corpus never could), with [[segment]]
    * applying the learned rules distributively. The sequential-greedy
    * contract is pinned three ways in BpeSpec: both trainers fuzz against
    * the naive in-memory reference, and trainLocal equals train on the
    * real corpus vocabulary.
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

  /** Driver-side trainer over the COLLECTED word-frequency table — the
    * documented scale path past [[train]]'s one-job-per-merge ceiling
    * (see that method's scaladoc): a real tokenizer's 30k-100k merges are
    * hours of job scheduling distributively, but the word-frequency table
    * is vocab-sized — bounded by DISTINCT words, not corpus rows — so it
    * fits on the driver where 100 TB of documents never could, and the
    * whole induction runs with zero further cluster round-trips
    * ([[segment]] then applies the learned rules distributively).
    *
    * Exact same sequential-greedy contract as [[train]]: argmax by
    * (count desc, w1 asc, w2 asc), merge application IS
    * `java.lang.String.replace` on the spaced form — including its
    * flanking-space non-overlap subtlety (` a a a a ` → ` aa a a `, the
    * match at the replacement's trailing space is skipped) — so the two
    * trainers are rule-for-rule identical (BpeSpec fuzz parity pins it).
    *
    * Mechanics (the fast-BPE shape): incremental pair bookkeeping instead
    * of a full recount per rank — an inverted index pair→words limits each
    * merge's work to the words that actually contain it, and the argmax is
    * a lazy-deletion max-heap (pop until the snapshot matches the live
    * count); per-merge cost is O(affected words + log #pairs), not
    * O(vocabulary).
    */
  def trainLocal(wordFreq: DataFrame, nMerges: Int): DataFrame = {
    val spark = wordFreq.sparkSession
    import spark.implicits._
    val rows = wordFreq
      .select(col("word").cast("string"), col("f").cast("long"))
      .as[(String, Long)].collect()
    trainInMemory(rows, nMerges)
      .toDF("merge_rank", "w1", "w2", "merged", "pair_count")
  }

  /** The in-memory induction behind [[trainLocal]] (package-visible so the
    * parity spec can drive it directly).
    */
  private[graft] def trainInMemory(rows: Array[(String, Long)],
      nMerges: Int): Seq[(Int, String, String, String, Long)] = {
    import scala.collection.mutable
    val freqs = rows.map(_._2)
    val strs = rows.map { case (w, _) => w.map(c => s" $c").mkString + " " }

    def pairsOf(s: String): Array[(String, String)] = {
      val syms = s.trim.split(" ").filter(_.nonEmpty)
      if (syms.length < 2) Array.empty
      else Array.tabulate(syms.length - 1)(i => (syms(i), syms(i + 1)))
    }

    val counts = mutable.HashMap.empty[(String, String), Long]
    val occ = mutable.HashMap.empty[(String, String), mutable.Set[Int]]
    // Max-heap: highest count first, then LOWEST (w1, w2) — the exact
    // argmax order `train`'s orderBy uses.
    val ord = new Ordering[(Long, String, String)] {
      def compare(x: (Long, String, String), y: (Long, String, String)): Int = {
        val c = java.lang.Long.compare(x._1, y._1)
        if (c != 0) c
        else {
          val a = y._2.compareTo(x._2)
          if (a != 0) a else y._3.compareTo(x._3)
        }
      }
    }
    val heap = mutable.PriorityQueue.empty[(Long, String, String)](ord)

    def add(wid: Int, s: String, changed: mutable.Set[(String, String)]): Unit =
      pairsOf(s).foreach { p =>
        counts(p) = counts.getOrElse(p, 0L) + freqs(wid)
        occ.getOrElseUpdate(p, mutable.Set.empty) += wid
        changed += p
      }

    def remove(wid: Int, s: String, changed: mutable.Set[(String, String)]): Unit =
      pairsOf(s).foreach { p =>
        val c = counts(p) - freqs(wid)
        if (c == 0L) counts.remove(p) else counts(p) = c
        occ.get(p).foreach { ws => ws -= wid; if (ws.isEmpty) occ.remove(p) }
        changed += p
      }

    {
      val init = mutable.Set.empty[(String, String)]
      strs.indices.foreach(i => add(i, strs(i), init))
      counts.foreach { case ((a, b), c) => heap.enqueue((c, a, b)) }
    }

    val out = mutable.ListBuffer.empty[(Int, String, String, String, Long)]
    var m = 1
    var exhausted = false
    while (m <= nMerges && !exhausted) {
      var top: Option[(Long, String, String)] = None
      while (top.isEmpty && heap.nonEmpty) {
        val cand = heap.dequeue()
        if (counts.get((cand._2, cand._3)).contains(cand._1)) top = Some(cand)
      }
      top match {
        case None => exhausted = true
        case Some((c, w1, w2)) =>
          out += ((m, w1, w2, w1 + w2, c))
          val pat = s" $w1 $w2 "
          val rep = s" $w1$w2 "
          val affected = occ.get((w1, w2)).map(_.toArray).getOrElse(Array.empty)
          val changed = mutable.Set.empty[(String, String)]
          affected.foreach { wid =>
            val old = strs(wid)
            remove(wid, old, changed)
            val next = old.replace(pat, rep)
            strs(wid) = next
            add(wid, next, changed)
          }
          changed.foreach { p =>
            counts.get(p).foreach(cc => heap.enqueue((cc, p._1, p._2)))
          }
          m += 1
      }
    }
    out.toList
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
