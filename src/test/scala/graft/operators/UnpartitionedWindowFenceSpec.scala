package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Source fence for the r19 unpartitioned-window audit (VERDICT r18
  * task 4): every `Window.orderBy(...)` / frame-only `Window.rowsBetween`
  * construction in src/main/scala moves ALL its input rows through ONE
  * partition — Spark logs `WindowExec: No Partition Defined` and
  * serializes — which is a 100 TB scale-killer unless the input is
  * provably bounded. This spec pins the EXACT audited site set; a new
  * unpartitioned window fails the fence and must either prove its input
  * O(bounded) here or rewrite via the two-pass patterns
  * (`Partitioning.prefixMax` / `globalRowNumber`).
  *
  * The audited sites and their boundedness proofs:
  *
  *  - Partitioning.scala ×2 (`prefixMax`, `globalRowNumber` second
  *    passes): input is the per-partition summary — exactly
  *    `numPartitions` rows, O(constant). These ARE the rewrite pattern.
  *  - Layout.scala ×1 (`binPack`): runs on the compaction MANIFEST (one
  *    row per file — ~100k rows for 100 TB of 1 GB files), never on data
  *    rows; documented in the operator scaladoc.
  *  - TextQueries.scala ×2 (q_text_vocab_encode, q_text_vocab_coverage):
  *    both rank over an `orderBy(...).limit(64)` TakeOrdered — 64 rows,
  *    O(constant). (vocab_coverage ranked the whole vocabulary before
  *    r19 — rewritten, since vocabulary size is data-dependent.)
  *  - TextQueries.scala ×1 (q_text_bpe_fertility `wAll`): input is
  *    groupBy(pieces-per-word) — bounded by the longest word's piece
  *    count (≤ word length in characters), not by corpus size.
  *  - StatsQueries.scala ×1 (q_events_survival `wAtRisk`): input is
  *    groupBy(duration-in-days) — bounded by the observation horizon in
  *    days (time-bounded, not data-sized).
  *  - StatsQueries.scala ×1 (q_ts_seasonal_dow `wAll`): input is
  *    groupBy(day-of-week) — exactly ≤ 7 rows.
  *  - Sampling.scala ×1 (`priorityK`): global top-k rank, but Spark 4
  *    plans `row_number ≤ k` with WindowGroupLimit — each upstream
  *    partition forwards at most k candidates, so the single-partition
  *    pass sees ≤ k·numPartitions rows, never the corpus (the operator
  *    scaladoc documents this; the fence's regex caught this multi-line
  *    site that a single-line grep missed).
  *
  * Rewritten in r19 (data-sized inputs, now two-pass): q_events_gini's
  * global rank and q_events_lorenz's ntile (user-sized input →
  * `globalRowNumber` + `ntileFromRank`), q_text_vocab_coverage's vocab
  * rank (vocabulary-sized → top-64 TakeOrdered). Equivalence is pinned
  * by PrefixMaxSpec (rank/ntile parity vs the single-partition forms)
  * and by the unchanged DuckDB oracles, which keep the plain
  * OVER (ORDER BY) spellings.
  */
class UnpartitionedWindowFenceSpec extends AnyFunSuite {

  private val pattern =
    """Window\s*\.\s*(orderBy|rowsBetween|rangeBetween)\(""".r

  /** (file → unpartitioned-window construction count) over non-comment
    * source lines.
    */
  private def scan(): Map[String, Int] = {
    val root = java.nio.file.Paths.get("src/main/scala")
    val files = java.nio.file.Files.walk(root).iterator()
    val counts = scala.collection.mutable.Map[String, Int]()
    files.forEachRemaining { p =>
      if (p.toString.endsWith(".scala")) {
        val code = scala.io.Source.fromFile(p.toFile)(scala.io.Codec.UTF8)
        val body = try code.getLines()
          .filterNot { l => val t = l.trim; t.startsWith("//") || t.startsWith("*") }
          .mkString("\n")
        finally code.close()
        val n = pattern.findAllIn(body).size
        if (n > 0) counts(p.getFileName.toString) = n
      }
    }
    counts.toMap
  }

  test("every unpartitioned window construction site is enumerated and audited") {
    val expected = Map(
      "Partitioning.scala" -> 2,
      "Layout.scala" -> 1,
      "TextQueries.scala" -> 3,
      "StatsQueries.scala" -> 2,
      "Sampling.scala" -> 1)
    val got = scan()
    assert(got == expected,
      s"unpartitioned-window sites changed: got $got, audited set $expected — " +
        "a NEW site must prove its input row count bounded (constant, " +
        "manifest-, or horizon-sized; see this spec's scaladoc) or rewrite " +
        "via Partitioning.prefixMax / globalRowNumber before being added here")
  }
}
