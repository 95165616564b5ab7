package graft.queries

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

/** Corpus-cleaning operators a production training-data pipeline runs
  * BEFORE the dedup/decontaminate chain in [[TextQueries]]: corpus-frequency
  * boilerplate removal (the CCNet/RefinedWeb "drop paragraphs that repeat
  * across many documents" rule) and PII redaction with stable
  * pseudonymization. Both are oracle-exact — the DuckDB side replays the
  * same segmentation / regex / hash arithmetic.
  */
object CurationQueries extends Catalog {

  /** Non-overlapping segment width (tokens) and the corpus-frequency
    * threshold above which a segment counts as boilerplate. W=3 over the
    * testdata vocabulary yields a ~9% drop rate at both sf0.001 and sf0.01
    * — non-degenerate in either direction (measured; a W where nothing or
    * everything drops would make the oracle a no-op).
    */
  private val SegW = 3
  private val BoilerplateFreq = 3

  /** Per-source keep quota for q_curate_source_quota — 5 of the testdata's
    * 25 docs/source survive, non-degenerate in both directions.
    */
  private val SourceCap = 5

  def queries: Map[String, Q] = Map(

    // Training-mix diversity (Gini–Simpson index 1 − Σp²) per language —
    // the balance statistic a pretraining-mix designer tracks per slice:
    // 0 means one source dominates, (k−1)/k means a perfectly even
    // k-source mix. Deliberately Simpson, NOT Shannon entropy: entropy
    // needs log(), whose last-ulp behavior differs across libm
    // implementations (the engine's standing determinism rule — see
    // Sampling's pow() avoidance), while Σp² is exact integer ppm
    // arithmetic end-to-end. Scale shape: two nested map-side-combined
    // aggregates, both on corpus-collapsed relations (lang×source, then
    // lang). Overflow: n²·10⁶ wraps past ~3·10⁹ docs per language —
    // compute per-source shares in ppm FIRST at that scale.
    "q_curate_mix_diversity" -> Q(
      t => {
        t.documents.groupBy(col("lang"), col("source"))
          .agg(count(lit(1)).as("ns"))
          .groupBy(col("lang"))
          .agg(sum(col("ns")).as("n_docs"),
            sum(col("ns") * col("ns")).as("s2"),
            count(lit(1)).as("n_sources"))
          .select(col("lang"), col("n_docs"), col("n_sources"),
            expr("1000000 - s2 * 1000000 div (n_docs * n_docs)").as("simpson_ppm"))
          .orderBy(col("lang"))
      },
      Some("""WITH bysrc AS (
              |  SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS ns
              |  FROM documents GROUP BY 1, 2
              |), m AS (
              |  SELECT lang, CAST(SUM(ns) AS BIGINT) AS n_docs,
              |         CAST(SUM(ns * ns) AS BIGINT) AS s2,
              |         CAST(COUNT(*) AS BIGINT) AS n_sources
              |  FROM bysrc GROUP BY lang
              |)
              |SELECT lang, n_docs, n_sources,
              |       1000000 - s2 * 1000000 // (n_docs * n_docs) AS simpson_ppm
              |FROM m
              |ORDER BY lang NULLS FIRST""".stripMargin)),

    // Corpus-frequency boilerplate removal (CCNet-style line dedup, with
    // fixed-width token segments standing in for lines — the testdata text
    // has no newlines). Plan shape, which is the canonical one at 100 TB:
    //   1. map-side: tokenize → non-overlapping W-token segments
    //      (posexplode; narrow, no string re-materialization beyond the
    //      segment itself);
    //   2. groupBy(segment).count — ONE corpus shuffle, and partial
    //      aggregation collapses duplicate segments map-side first;
    //   3. heavy-hitter filter (freq >= T) shrinks the frequency table to
    //      the boilerplate set — by construction a small relation (few
    //      distinct segments account for the repeated mass), so AQE plans
    //      the anti-join back as a broadcast, not a second corpus-wide
    //      shuffle pair;
    //   4. regroup kept segments by doc_id (second corpus shuffle) and
    //      reassemble in segment order via array_sort on (idx, seg).
    // Documents whose every segment is boilerplate drop out entirely —
    // the same contract CCNet applies (empty docs are discarded).
    "q_dedup_boilerplate" -> Q(
      t => {
        val segW = lit(SegW)
        val toks = TextAnalysis.tokens(col("text"))
        val nSeg = ceil(size(col("__tk")).cast("double") / SegW).cast("long")
        val segs = t.documents
          .select(col("doc_id"), toks.as("__tk"))
          .withColumn("n_total", nSeg)
          .select(col("doc_id"), col("n_total"),
            posexplode(transform(
              sequence(lit(0), greatest(col("n_total"), lit(1)).cast("int") - 1),
              i => concat_ws(" ", slice(col("__tk"), i * segW + 1, segW)))))
          .withColumnsRenamed(Map("pos" -> "idx", "col" -> "seg"))
        val boilerplate = segs.groupBy(col("seg"))
          .agg(count(lit(1)).as("__c"))
          .filter(col("__c") >= BoilerplateFreq)
          .select(col("seg"))
        segs.join(boilerplate, Seq("seg"), "left_anti")
          .groupBy(col("doc_id"))
          .agg(
            concat_ws(" ",
              transform(array_sort(collect_list(struct(col("idx"), col("seg")))),
                s => s.getField("seg"))).as("clean_text"),
            count(lit(1)).as("n_kept"),
            max(col("n_total")).as("n_total"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH tok AS (
              |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
              |  FROM documents
              |), seg AS (
              |  SELECT doc_id, i AS idx,
              |         CAST(ceil(len(toks) / $SegW.0) AS BIGINT) AS n_total,
              |         array_to_string(toks[(i*$SegW+1):(i*$SegW+$SegW)], ' ') AS seg
              |  FROM tok, LATERAL unnest(range(0,
              |         greatest(CAST(ceil(len(toks) / $SegW.0) AS BIGINT), 1))) AS t(i)
              |), boilerplate AS (
              |  SELECT seg FROM seg GROUP BY seg HAVING count(*) >= $BoilerplateFreq
              |), kept AS (
              |  SELECT s.* FROM seg s
              |  LEFT JOIN boilerplate b ON s.seg = b.seg
              |  WHERE b.seg IS NULL
              |)
              |SELECT doc_id,
              |       string_agg(seg, ' ' ORDER BY idx) AS clean_text,
              |       count(*) AS n_kept,
              |       max(n_total) AS n_total
              |FROM kept GROUP BY doc_id
              |ORDER BY doc_id NULLS FIRST""".stripMargin)),

    // PII redaction with stable pseudonymization over the events "log"
    // stream: digit runs in the free-form payload are masked to <NUM>
    // BEFORE the pseudonym is appended (the pseudonym is a hex hash prefix
    // — masking afterwards would mangle its own digits), and the user id
    // becomes a deterministic sha256-prefix pseudonym so downstream
    // grouping/joining on the redacted stream still works. Entirely
    // map-side narrow work (regexp_replace + sha2, both codegen'd
    // built-ins) — the one shape that is trivially linear at 100 TB.
    "q_text_redact" -> Q(
      t => {
        val pseudo = concat(lit("u:"),
          substring(sha2(col("user_id").cast("string"), 256), 1, 8))
        val masked = regexp_replace(
          concat(col("event_type"), lit(" props="), col("props")),
          "[0-9]+", "<NUM>")
        t.events
          .select(col("event_id"),
            concat(masked, lit(" user="), pseudo).as("redacted"),
            pseudo.as("user_pseudo"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT event_id,
             |       regexp_replace(event_type || ' props=' || props,
             |                      '[0-9]+', '<NUM>', 'g')
             |         || ' user=u:' || substr(sha256(CAST(user_id AS VARCHAR)), 1, 8)
             |         AS redacted,
             |       'u:' || substr(sha256(CAST(user_id AS VARCHAR)), 1, 8) AS user_pseudo
             |FROM events
             |ORDER BY event_id NULLS FIRST""".stripMargin)),

    // Per-source quota — the CommonCrawl-style "cap documents per domain"
    // curation rule: rank every document within its source by the same
    // exact milli-logit quality score as q_text_quality_score (higher =
    // keep first; doc_id breaks ties deterministically) and keep at most
    // `SourceCap` per source. Plan shape at 100 TB: the rank<=k filter on
    // a row_number window lets Spark insert WindowGroupLimit — each map
    // task pre-prunes to its local top-k per source BEFORE the shuffle, so
    // the shuffle carries O(sources·k·tasks) rows, not the corpus, and a
    // hot domain holding half the crawl still lands at most k·tasks rows
    // on its reducer (CurationQueriesSpec pins the WindowGroupLimit node).
    "q_curate_source_quota" -> Q(
      t => {
        val tkn = TextAnalysis.tokenCount(col("text")).cast("long")
        val dkn = size(array_distinct(TextAnalysis.tokens(col("text")))).cast("long")
        val swn = TextAnalysis.stopwordCount(col("text")).cast("long")
        val chn = length(regexp_replace(col("text"), "\\s+", "")).cast("long")
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("source"))
          .orderBy(col("score_milli").desc, col("doc_id"))
        t.documents
          .select(col("doc_id"), col("source"),
            (lit(40L) * tkn + lit(60L) * dkn + lit(150L) * swn
              - lit(9L) * chn).as("score_milli"))
          .withColumn("rnk", row_number().over(w).cast("long"))
          .filter(col("rnk") <= SourceCap)
          .orderBy(col("source"), col("rnk"), col("doc_id"), col("score_milli"))
      },
      Some(s"""WITH f AS (
              |  SELECT doc_id, source,
              |         40 * CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
              |       + 60 * CAST(len(list_distinct(string_split_regex(trim(text), '\\s+'))) AS BIGINT)
              |       + 150 * CAST(len(regexp_extract_all(lower(text), '${TextAnalysis.StopwordPattern}')) AS BIGINT)
              |       - 9 * CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS BIGINT)
              |         AS score_milli
              |  FROM documents
              |), r AS (
              |  SELECT doc_id, source, score_milli,
              |         row_number() OVER (PARTITION BY source
              |                            ORDER BY score_milli DESC, doc_id) AS rnk
              |  FROM f
              |)
              |SELECT doc_id, source, score_milli, rnk FROM r WHERE rnk <= $SourceCap
              |ORDER BY source NULLS FIRST, rnk NULLS FIRST, doc_id NULLS FIRST,
              |         score_milli NULLS FIRST""".stripMargin)))
}
