package graft.operators

import org.apache.spark.sql.Column
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
}
