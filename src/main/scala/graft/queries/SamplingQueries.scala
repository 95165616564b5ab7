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

    // Systematic every-k-th sampling (see Sampling.systematic for the
    // scale-safe bucketed-stride formulation): k=7 so bucket sizes at the
    // gated SFs are never stride-aligned and the ceil(|bucket|/k) edge is
    // exercised in every bucket.
    "q_sample_systematic" -> Q(
      t => Sampling.systematic(t.documents, "doc_id", k = 7, salt = "s5")
        // the operator no longer leaks its helper columns; recompute the
        // draw for display — hashKey is a pure content hash, so this is
        // the identical value the stride used
        .select(col("doc_id"),
          substring(Sampling.hashKey(col("doc_id"), "s5"), 1, 1).as("bucket"),
          Sampling.hashKey(col("doc_id"), "s5").as("draw"))
        .orderBy(col("bucket"), col("draw"), col("doc_id")),
      Some(s"""WITH drawn AS (
               |  SELECT doc_id,
               |         ${Sampling.hashKeySql("doc_id", "s5")} AS draw
               |  FROM documents
               |), ranked AS (
               |  SELECT doc_id, substring(draw, 1, 1) AS bucket, draw,
               |         row_number() OVER (PARTITION BY substring(draw, 1, 1)
               |           ORDER BY draw, doc_id) AS rn
               |  FROM drawn
               |)
               |SELECT doc_id, bucket, draw FROM ranked
               |WHERE (rn - 1) % 7 = 0
               |ORDER BY bucket NULLS FIRST, draw NULLS FIRST, doc_id NULLS FIRST""".stripMargin)),

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

    // Temporal split with an embargo gap — the leakage guard hash splits
    // CANNOT give for time-series models: a hash split scatters each
    // user's timeline across train and test, so the model trains on the
    // future of its own eval set (lookahead leakage), and rows adjacent
    // to the cut leak through autocorrelation. The fix is the standard
    // backtest protocol (de Prado's purged split): train strictly before
    // cut − gap, test strictly after the cut, and the gap-width embargo
    // zone DROPPED. The cut is the 80% point of the observed time range
    // (broadcast min/max scalar — one tiny aggregate, no quantile scan);
    // all arithmetic is integer µs. Map-side banding, one 3-group count.
    "q_sample_temporal_split" -> Q(
      t => {
        val gapUs = 86400000000L // 1-day embargo
        val ev = t.events.select(expr("unix_micros(ts)").as("us"))
        val mm = ev.agg(min(col("us")).as("t0"), max(col("us")).as("t1"))
        ev.crossJoin(broadcast(mm))
          .select(col("us"),
            expr("t0 + (t1 - t0) * 4 div 5").as("cut"))
          .select(col("us"),
            when(col("us") <= col("cut") - gapUs, "train")
              .when(col("us") > col("cut"), "test")
              .otherwise("embargo").as("split"))
          .groupBy(col("split"))
          .agg(count(lit(1)).as("n"), min(col("us")).as("min_us"),
            max(col("us")).as("max_us"))
          .orderBy(col("split"))
      },
      Some("""WITH ev AS (
              |  SELECT epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events
              |), mm AS (
              |  SELECT MIN(us) AS t0, MAX(us) AS t1 FROM ev
              |), b AS (
              |  SELECT us,
              |         CASE WHEN us <= t0 + (t1 - t0) * 4 // 5 - 86400000000
              |                THEN 'train'
              |              WHEN us > t0 + (t1 - t0) * 4 // 5 THEN 'test'
              |              ELSE 'embargo' END AS split
              |  FROM ev CROSS JOIN mm
              |)
              |SELECT split, CAST(COUNT(*) AS BIGINT) AS n,
              |       MIN(us) AS min_us, MAX(us) AS max_us
              |FROM b GROUP BY split
              |ORDER BY split NULLS FIRST""".stripMargin)),

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
               |ORDER BY source NULLS FIRST, split NULLS FIRST""".stripMargin)),

    // Poisson bootstrap — the scale-correct resampling scheme (Chamandy et
    // al., Google 2012): classic bootstrap draws n-with-replacement per
    // replicate, which needs global coordination; Poisson bootstrap gives
    // every (row, replicate) an INDEPENDENT Poisson(1) multiplicity, so
    // resampling is a pure map over the stream — R× narrow explode, one
    // per-replicate aggregate, no shuffle of history, works identically
    // on a 100 TB table. Multiplicities come from the engine-portable md5
    // draw compared against the Poisson(1) CDF rendered as FIXED 8-hex
    // thresholds (computed once, embedded in both plans — same
    // determinism contract as every Sampling operator; capped at 6,
    // P(>6) ≈ 8e-5). Per replicate: effective n, exact cents sum, and
    // the mean in integer micro-cents (ONE integer division). The spread
    // across the 8 replicate means IS the bootstrap uncertainty band.
    "q_sample_bootstrap" -> Q(
      t => {
        val R = 8
        // Poisson(1) CDF as hex thresholds: P(≤k)·2^32 for k = 0..5
        val cdf = Seq("5e2d58d9", "bc5ab1b1", "eb715e1e",
          "fb239797", "ff1025f6", "ffd90f3c")
        val ev = t.events.select(col("event_id"), cents(col("value")).cast("long").as("c"))
        val drawn = ev
          .withColumn("r", explode(sequence(lit(0L), lit((R - 1).toLong))))
          .withColumn("h", Sampling.hashKey(
            concat_ws("#", col("event_id"), col("r")), "boot"))
        val k = cdf.zipWithIndex
          .foldLeft(when(lit(false), lit(0))) { case (acc, (t0, i)) =>
            acc.when(col("h") < lit(t0), lit(i))
          }.otherwise(lit(6))
        drawn
          .select(col("r"), col("c"), k.cast("long").as("k"))
          .groupBy(col("r"))
          .agg(sum(col("k")).as("n_eff"),
            sum(col("k") * col("c")).as("sum_cents"))
          .withColumn("mean_u", expr("sum_cents * 1000000 div n_eff"))
          .orderBy(col("r"))
      },
      Some("""WITH drawn AS (
              |  SELECT r,
              |         CAST(floor(value * 100 + 0.5) AS BIGINT) AS c,
              |         substring(md5('boot:' || CAST(event_id AS VARCHAR)
              |                       || '#' || CAST(r AS VARCHAR)), 1, 8) AS h
              |  FROM events CROSS JOIN (SELECT unnest(range(0, 8)) AS r)
              |), mult AS (
              |  SELECT r, c,
              |         CAST(CASE WHEN h < '5e2d58d9' THEN 0
              |                   WHEN h < 'bc5ab1b1' THEN 1
              |                   WHEN h < 'eb715e1e' THEN 2
              |                   WHEN h < 'fb239797' THEN 3
              |                   WHEN h < 'ff1025f6' THEN 4
              |                   WHEN h < 'ffd90f3c' THEN 5
              |                   ELSE 6 END AS BIGINT) AS k
              |  FROM drawn
              |)
              |SELECT r, CAST(SUM(k) AS BIGINT) AS n_eff,
              |       CAST(SUM(k * c) AS BIGINT) AS sum_cents,
              |       CAST(SUM(k * c) AS BIGINT) * 1000000
              |         // CAST(SUM(k) AS BIGINT) AS mean_u
              |FROM mult
              |GROUP BY r
              |ORDER BY r NULLS FIRST""".stripMargin)),

    // Class-balanced downsampling — equalize class sizes by keeping
    // exactly min-class-count rows per class, chosen by the deterministic
    // md5 order (so the subsample is reproducible and unbiased within
    // class). The "keep quota" is ONE global scalar from a class-count
    // aggregate (broadcast back); selection is a per-class window rank
    // over the draw — one exchange on the class key. The imbalanced-
    // pretraining-mix fix, stated relationally.
    "q_sample_balance_classes" -> Q(
      t => {
        val cnt = t.documents.groupBy(col("lang")).agg(count(lit(1)).as("n"))
        val quota = cnt.agg(min(col("n")).as("m"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("lang"))
          .orderBy(Sampling.hashKey(col("doc_id"), "bal"), col("doc_id"))
        t.documents.select(col("doc_id"), col("lang"))
          .withColumn("rk", row_number().over(w))
          .crossJoin(broadcast(quota))
          .filter(col("rk") <= col("m"))
          .select(col("doc_id"), col("lang"))
          .orderBy(col("lang"), col("doc_id"))
      },
      Some("""WITH m AS (
              |  SELECT MIN(n) AS m FROM (
              |    SELECT lang, COUNT(*) AS n FROM documents GROUP BY 1)
              |), rk AS (
              |  SELECT doc_id, lang,
              |         row_number() OVER (PARTITION BY lang
              |           ORDER BY substring(md5('bal:' || CAST(doc_id AS VARCHAR)), 1, 8),
              |                    doc_id) AS rk
              |  FROM documents
              |)
              |SELECT doc_id, lang
              |FROM rk CROSS JOIN m
              |WHERE rk <= m
              |ORDER BY lang NULLS FIRST, doc_id NULLS FIRST""".stripMargin)))
}
