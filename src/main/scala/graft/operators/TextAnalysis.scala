package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis column functions for large-scale training-data pipelines:
  * token counting, punctuation/stopword quality signals, n-gram-marker
  * language ID, and a deterministic polynomial document fingerprint.
  *
  * Everything is a composed built-in HOF (codegen-able, no UDFs), and every
  * function has an exact DuckDB twin so it sits under the oracle gate —
  * the cross-engine-portable definition is the point: a fingerprint that
  * only one engine can compute can't be used for cross-system dedup.
  */
object TextAnalysis {

  /** Whitespace tokenization — the common denominator both engines share. */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  def tokenCount(c: Column): Column = size(tokens(c))

  /** Count of non-alphanumeric, non-space characters. */
  def punctCount(c: Column): Column = regexp_count(c, lit("[^a-zA-Z0-9 ]"))

  /** English stopword hits (small fixed set — a quality signal, not NLP). */
  val StopwordPattern = "\\b(the|a|an|and|or|of|to|in|is|on|for|with)\\b"
  def stopwordCount(c: Column): Column = regexp_count(lower(c), lit(StopwordPattern))

  /** Mean token length (chars excluding whitespace / token count). */
  def avgWordLen(c: Column): Column =
    length(regexp_replace(c, "\\s+", "")).cast("double") / tokenCount(c)

  /** BPE-style pre-tokenizer piece count (the GPT-2 pre-tokenization regex
    * family, public knowledge): contractions, space-prefixed letter runs,
    * digit runs, punctuation runs, residual whitespace. A fast proxy for
    * "LLM token count" that needs no vocabulary — each piece maps to ≥1 BPE
    * token, so this lower-bounds real tokenizer output and tracks it
    * closely on natural text.
    */
  val BpePiecePattern =
    "'s|'t|'re|'ve|'m|'ll|'d| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\\s]+|\\s+"
  def bpePieceCount(c: Column): Column = regexp_count(c, lit(BpePiecePattern))

  /** Marker-regex language scores; predicted language = max score, ties
    * broken toward the alphabetically-first code (min over (-score, code)).
    */
  val LangMarkers: Seq[(String, String)] = Seq(
    "de" -> "\\b(der|die|das|und|ist|nicht)\\b",
    "en" -> "\\b(the|and|of|is|that|this)\\b",
    "es" -> "\\b(el|la|los|las|y|que)\\b",
    "fr" -> "\\b(le|les|et|est|que|une)\\b")

  def langId(c: Column): Column = {
    val scored = LangMarkers.map { case (code, pattern) =>
      struct(
        (regexp_count(lower(c), lit(pattern)) * -1).as("neg_score"),
        lit(code).as("lang"))
    }
    array_min(array(scored: _*)).getField("lang")
  }

  /** Deterministic rolling polynomial hash over the document's characters:
    * fold (acc * 31 + codepoint) mod 1e9+7, evaluated by the native codegen
    * kernel ([[graft.functions.PolyHashKernel]]). Identical to DuckDB's
    * list_reduce over string_split(text, '') — golden: "abc" → 96354.
    */
  val HashPrime = 1000000007L
  def fingerprint(c: Column): Column =
    graft.functions.PolyHashExpression.column(c)

  /** Word n-grams over a pre-materialized token array (empty when the doc
    * has fewer than n tokens — unlike [[graft.operators.Dedup.shingles]],
    * which degrades to one whole-doc shingle, repetition counting must not
    * fabricate a gram for short docs).
    */
  def ngramsFromTokens(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
      .otherwise(array().cast("array<string>"))

  /** Per-document n-gram repetition profile — the Gopher/RefinedWeb-family
    * "fraction of duplicate n-grams" signal that catches boilerplate and
    * degenerate generations which whole-doc dedup misses. Output per id:
    * `n_grams` (total occurrences), `top_gram_count` (occurrences of the
    * most repeated gram), `dup_gram_occ` (occurrences belonging to grams
    * appearing ≥2 times). Ratios are left to the caller so the outputs stay
    * integral (engine-portable, no float hashing concerns).
    *
    * Scale shape (100 TB): explode is map-side; the (id, gram) count is one
    * hash shuffle where partial aggregation collapses the repeated grams —
    * exactly the hot keys — and the per-doc rollup is a second, already
    * small, shuffle on id. The alternative per-row HOF (count occurrences
    * of each distinct gram by scanning the gram array) is shuffle-free but
    * O(len²) per document, which loses on long documents; two partial-agg
    * shuffles are the better trade at corpus scale.
    */
  def repetitionStats(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 2): DataFrame = {
    val grams = docs
      .select(col(idCol).as("__rep_id"), tokens(col(textCol)).as("__tk"))
      .select(col("__rep_id"), explode(ngramsFromTokens(col("__tk"), n)).as("gram"))
    grams
      .groupBy(col("__rep_id"), col("gram"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("__rep_id"))
      .agg(
        sum(col("c")).as("n_grams"),
        max(col("c")).as("top_gram_count"),
        sum(when(col("c") >= 2, col("c")).otherwise(0L)).as("dup_gram_occ"))
      .withColumnRenamed("__rep_id", idCol)
  }
}
