package graft.queries

import graft.operators.Sampling
import org.apache.spark.sql.functions._

/** Deterministic sampling / train-val-test splitting over `documents`
  * (training-data pipeline surface). The oracle SQL embeds thresholds
  * computed by the SAME `Sampling.hexThreshold` the Spark plan uses, so the
  * two sides cannot drift.
  */
object SamplingQueries extends Catalog {

  private val strataFractions = Seq("en" -> 0.2, "de" -> 0.5, "zh" -> 1.0)
  private val splitWeights = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)

  def queries: Map[String, Q] = Map(
    "q_sample_bernoulli" -> Q(
      t => Sampling.bernoulli(t.documents, "doc_id", fraction = 0.2, salt = "s1")
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id"), col("lang")),
      Some(s"""SELECT doc_id, lang FROM documents
               |WHERE ${Sampling.hashKeySql("doc_id", "s1")} < '${Sampling.hexThreshold(0.2)}'
               |ORDER BY doc_id NULLS FIRST, lang NULLS FIRST""".stripMargin)),

    "q_sample_stratified" -> Q(
      t => Sampling.stratified(t.documents, "lang", "doc_id",
        fractions = strataFractions.toMap, default = 0.1, salt = "s2")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_kept"))
        .orderBy(col("lang"), col("n_kept")),
      Some {
        val cases = strataFractions.map { case (l, f) =>
          s"WHEN '$l' THEN '${Sampling.hexThreshold(f)}'"
        }.mkString(" ")
        s"""SELECT lang, COUNT(*) AS n_kept FROM documents
           |WHERE ${Sampling.hashKeySql("doc_id", "s2")}
           |      < CASE lang $cases ELSE '${Sampling.hexThreshold(0.1)}' END
           |GROUP BY lang
           |ORDER BY lang NULLS FIRST, n_kept NULLS FIRST""".stripMargin
      }),

    "q_sample_exact_k" -> Q(
      t => Sampling.exactKPerStratum(t.documents, "lang", "doc_id", k = 10, salt = "s4")
        .select(col("lang"), col("doc_id"))
        .orderBy(col("lang"), col("doc_id")),
      Some(s"""SELECT lang, doc_id FROM (
               |  SELECT lang, doc_id,
               |         row_number() OVER (PARTITION BY lang
               |           ORDER BY ${Sampling.hashKeySql("doc_id", "s4")}, doc_id) AS rk
               |  FROM documents)
               |WHERE rk <= 10
               |ORDER BY lang NULLS FIRST, doc_id NULLS FIRST""".stripMargin)),

    "q_sample_shuffle" -> Q(
      t => Sampling.epochShuffle(t.documents, "doc_id", epoch = 1)
        .limit(20)
        .select(col("doc_id"), col("shuffle_key"))
        .orderBy(col("shuffle_key"), col("doc_id")),
      Some(s"""SELECT doc_id, ${Sampling.hashKeySql("doc_id", "epoch1")} AS shuffle_key
               |FROM documents
               |ORDER BY shuffle_key NULLS FIRST, doc_id NULLS FIRST
               |LIMIT 20""".stripMargin)),

    // Importance sampling: keep each doc with probability min(1, 0.02·n_tokens)
    // — longer documents sampled more. 0.02 puts the testdata's token range
    // (10–99) astride the keep-always clamp, so both the probabilistic and
    // the clamped branch are exercised at every sf.
    "q_sample_weighted" -> Q(
      t => {
        val wdocs = t.documents.select(col("doc_id"),
          graft.operators.TextAnalysis.tokenCount(col("text")).as("n_tokens"))
        Sampling.weighted(wdocs, "doc_id", "n_tokens", rate = 0.02)
          .orderBy(col("doc_id"), col("n_tokens"))
      },
      Some(s"""WITH w AS (
               |  SELECT doc_id,
               |         CAST(len(string_split_regex(trim(text), '\\s+')) AS INTEGER) AS n_tokens
               |  FROM documents
               |)
               |SELECT doc_id, n_tokens FROM w
               |WHERE ${Sampling.weightedSql("doc_id", "n_tokens", 0.02)}
               |ORDER BY doc_id NULLS FIRST, n_tokens NULLS FIRST""".stripMargin)),

    "q_sample_split" -> Q(
      t => Sampling.split(t.documents, "doc_id", splitWeights, salt = "s3")
        .select(col("doc_id"), col("split"))
        .orderBy(col("doc_id"), col("split")),
      Some(s"""SELECT doc_id, ${Sampling.splitSql("doc_id", splitWeights, "s3")} AS split
               |FROM documents
               |ORDER BY doc_id NULLS FIRST, split NULLS FIRST""".stripMargin)),

    // Domain-mixture resampling (operators/Sampling.mixtureResample): keep
    // 60% of the corpus while oversampling three sources 3:1 over the rest
    // — the composition-control step of a training-data pipeline. Rates
    // derive from observed counts + target weights in one fixed-association
    // double expression; the draw reuses the weighted-sampling hash
    // predicate, so the oracle replays counts, rates, and draws exactly.
    "q_sample_mixture" -> Q(
      t => Sampling.mixtureResample(t.documents, "source", "doc_id",
        weightOf = expr("CASE WHEN source IN ('src0','src1','src2') THEN 3 ELSE 1 END"),
        budgetFrac = 0.6)
        .groupBy(col("source")).agg(count(lit(1)).as("n_kept"))
        .orderBy(col("source"), col("n_kept")),
      Some(s"""WITH per AS (
               |  SELECT source, COUNT(*) AS __n,
               |         CASE WHEN source IN ('src0','src1','src2') THEN 3 ELSE 1 END AS __w
               |  FROM documents GROUP BY source
               |), tot AS (
               |  SELECT SUM(__n) AS __tn, SUM(__w) AS __tw FROM per
               |), rates AS (
               |  SELECT source, least(CAST(1.0 AS DOUBLE), CAST(0.6 AS DOUBLE) * __tn * __w / (__tw * __n)) AS __rate
               |  FROM per CROSS JOIN tot
               |)
               |SELECT d.source, COUNT(*) AS n_kept
               |FROM documents d JOIN rates r USING (source)
               |WHERE ${Sampling.weightedSql("d.doc_id", "r.__rate", 1.0, "mixture")}
               |GROUP BY d.source
               |ORDER BY source NULLS FIRST, n_kept NULLS FIRST""".stripMargin)),

    // Weighted exact-k via priority sampling (Duffield–Lund–Thorup): the
    // k = 50 highest w/u priorities with w = n_chars — long documents
    // preferentially kept under a HARD size budget (the weighted dual of
    // exactKPerStratum's uniform draw). The key is a quotient of exact
    // integers (see Sampling.priorityK) so it is bit-identical across
    // engines without any pow()/ln() libm dependence; priority itself is
    // surfaced and compared, putting the whole scoring — not just
    // membership — under the exact gate.
    "q_sample_priority_k" -> Q(
      t => graft.operators.Sampling.priorityK(t.documents, "doc_id", "n_chars",
        k = 50, salt = "p1")
        .select(col("doc_id"), col("n_chars"), col("priority"))
        .orderBy(col("doc_id")),
      Some(s"""SELECT doc_id, n_chars, priority FROM (
               |  SELECT doc_id, n_chars,
               |         ${Sampling.priorityKeySql("doc_id", "n_chars", "p1")} AS priority,
               |         row_number() OVER (
               |           ORDER BY ${Sampling.priorityKeySql("doc_id", "n_chars", "p1")} DESC,
               |                    doc_id) AS rk
               |  FROM documents)
               |WHERE rk <= 50
               |ORDER BY doc_id NULLS FIRST""".stripMargin)),

    // Group-aware split: hash the GROUP key (source), not the row id, so
    // every document of a source lands in the same split — the leakage
    // guard an eval split needs when near-duplicate rows cluster within a
    // group (same crawl domain, same user). Same thresholds and salt
    // machinery as q_sample_split; only the hashed column changes — which
    // is the entire point: leakage safety is a one-argument decision, not
    // a new operator. Map-side, no shuffle.
    "q_sample_group_split" -> Q(
      t => Sampling.split(t.documents, "source", splitWeights, salt = "g1")
        .groupBy(col("source"), col("split"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("source"), col("split")),
      Some(s"""SELECT source, ${Sampling.splitSql("source", splitWeights, "g1")} AS split,
               |       COUNT(*) AS n
               |FROM documents
               |GROUP BY 1, 2
               |ORDER BY source NULLS FIRST, split NULLS FIRST""".stripMargin)))
}
