package graft.queries

import graft.operators.{Similarity, TextAnalysis}
import org.apache.spark.sql.functions._

/** Similarity-search queries over `embeddings` with exact DuckDB twins.
  * The dot products are left-to-right double folds on both engines
  * (Spark aggregate ≡ DuckDB list_reduce), so similarities are compared
  * bit-exactly before rounding.
  */
object SimilarityQueries extends Catalog {

  /** DuckDB: float[] list → double list, and the exact fold for dot/norm. */
  private def duckVecCte =
    """WITH e AS (
      |  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings
      |), n AS (
      |  SELECT vec_id, label, v,
      |         sqrt(list_reduce(list_transform(v, x -> x * x), (acc, x) -> acc + x)) AS nrm
      |  FROM e
      |)""".stripMargin

  private def duckDot(a: String, b: String) =
    s"list_reduce(list_transform(range(1, len($a) + 1), k -> $a[k] * $b[k]), (acc, x) -> acc + x)"

  /** DuckDB replay of Similarity.prepareQuantized + kmeansAssign with
    * k = 8, TWO Lloyd rounds, d = 64 (the driver embeddings' fixed width):
    * quantize → init centroids from the 8 lowest vec_ids → two rounds of
    * [assign (cosine vs centroid, ties to the lowest cluster) → per-dim
    * int64 centroid sums (empty cluster keeps its previous centroid)] →
    * final assignment against the round-2 centroids — exactly the
    * operator's `iters` update rounds + closing assignment. Ends with CTE
    * `asg(vec_id, q, aa, cl)`.
    */
  private def duckKmeansCtes: String = {
    def assign(cents: String, out: String) =
      s"""$out AS (
         |  SELECT vec_id, q, aa, cl FROM (
         |    SELECT v.vec_id, v.q, v.aa, c.cl,
         |           row_number() OVER (PARTITION BY v.vec_id ORDER BY
         |             CAST(${duckDot("v.q", "c.q")} AS DOUBLE) /
         |               sqrt(CAST(${duckDot("c.q", "c.q")} AS DOUBLE)) DESC, c.cl) AS rn
         |    FROM qkn v CROSS JOIN $cents c)
         |  WHERE rn = 1
         |)""".stripMargin
    def update(src: String, prevCents: String, n: Int) =
      s"""s$n AS (
         |  SELECT cl, t.i AS i, SUM(q[t.i]) AS s
         |  FROM $src CROSS JOIN range(1, 65) AS t(i)
         |  GROUP BY cl, t.i
         |), c${n}s AS (
         |  SELECT cl, list(CAST(s AS BIGINT) ORDER BY i) AS q FROM s$n GROUP BY cl
         |), c$n AS (
         |  SELECT cl, q FROM c${n}s
         |  UNION ALL
         |  SELECT cl, q FROM $prevCents WHERE cl NOT IN (SELECT cl FROM c${n}s)
         |)""".stripMargin
    s"""$duckVecCte, mxk AS (
       |  SELECT vec_id, v, list_max(list_transform(v, y -> abs(y))) AS ma
       |  FROM e
       |), qkv AS (
       |  SELECT vec_id,
       |         list_transform(v, x -> CASE WHEN ma = 0 THEN 0
       |           ELSE CAST(floor(x * 127.0 / ma + 0.5) AS BIGINT) END) AS q
       |  FROM mxk
       |), qkn AS (
       |  SELECT vec_id, q, ${duckDot("q", "q")} AS aa FROM qkv
       |), c0 AS (
       |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cl, q
       |  FROM (SELECT vec_id, q FROM qkn ORDER BY vec_id LIMIT 8)
       |), ${assign("c0", "a1")}, ${update("a1", "c0", 1)},
       |${assign("c1", "a2")}, ${update("a2", "c1", 2)},
       |${assign("c2", "asg")}""".stripMargin
  }

  /** DuckDB replay of the full PQ pipeline (q_sim_pq_topk): per subspace
    * mm over dims [mm·16+1, mm·16+16] — slice → deterministic init from
    * the 8 lowest vec_ids → two Lloyd rounds of the SAME exact-integer
    * spherical k-means as duckKmeansCtes → micro-unit mean codebook
    * (floor(sum·10⁶/count) as a double floor, the engine-portable form —
    * integer `//` would floor while Spark's `div` truncates on negative
    * sums) → per-query LUT dots → ADC sum over the 4 code rows.
    */
  private def duckPqCtes: String = {
    def sub(mm: Int): String = {
      val p = s"s$mm"
      val lo = mm * 16 + 1
      val hi = mm * 16 + 16
      def assign(cents: String, out: String) =
        s"""$out AS (
           |  SELECT vec_id, q, cl FROM (
           |    SELECT v.vec_id, v.q, c.cl,
           |           row_number() OVER (PARTITION BY v.vec_id ORDER BY
           |             CAST(${duckDot("v.q", "c.q")} AS DOUBLE) /
           |               sqrt(CAST(${duckDot("c.q", "c.q")} AS DOUBLE)) DESC, c.cl) AS rn
           |    FROM ${p}q v CROSS JOIN $cents c)
           |  WHERE rn = 1
           |)""".stripMargin
      def update(src: String, prevCents: String, n: Int) =
        s"""${p}u$n AS (
           |  SELECT cl, t.i AS i, SUM(q[t.i]) AS s
           |  FROM $src CROSS JOIN range(1, 17) AS t(i)
           |  GROUP BY cl, t.i
           |), ${p}c${n}s AS (
           |  SELECT cl, list(CAST(s AS BIGINT) ORDER BY i) AS q FROM ${p}u$n GROUP BY cl
           |), ${p}c$n AS (
           |  SELECT cl, q FROM ${p}c${n}s
           |  UNION ALL
           |  SELECT cl, q FROM $prevCents WHERE cl NOT IN (SELECT cl FROM ${p}c${n}s)
           |)""".stripMargin
      s"""${p}q AS (
         |  SELECT vec_id, q[$lo:$hi] AS q FROM qkv
         |), ${p}c0 AS (
         |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cl, q
         |  FROM (SELECT vec_id, q FROM ${p}q ORDER BY vec_id LIMIT 8)
         |), ${assign(s"${p}c0", s"${p}a1")}, ${update(s"${p}a1", s"${p}c0", 1)},
         |${assign(s"${p}c1", s"${p}a2")}, ${update(s"${p}a2", s"${p}c1", 2)},
         |${assign(s"${p}c2", s"${p}asg")}, ${p}cb AS (
         |  SELECT cl, list(CAST(floor(CAST(s * 1000000 AS DOUBLE) / cnt) AS BIGINT)
         |                  ORDER BY i) AS cv
         |  FROM (SELECT cl, t.i AS i, SUM(q[t.i]) AS s, COUNT(*) AS cnt
         |        FROM ${p}asg CROSS JOIN range(1, 17) AS t(i)
         |        GROUP BY cl, t.i)
         |  GROUP BY cl
         |), ${p}lut AS (
         |  SELECT v.vec_id AS qid, c.cl, CAST(${duckDot("v.q", "c.cv")} AS BIGINT) AS dotv
         |  FROM ${p}q v CROSS JOIN ${p}cb c
         |  WHERE v.vec_id < 5
         |)""".stripMargin
    }
    s"""$duckVecCte, mxk AS (
       |  SELECT vec_id, v, list_max(list_transform(v, y -> abs(y))) AS ma
       |  FROM e
       |), qkv AS (
       |  SELECT vec_id,
       |         list_transform(v, x -> CASE WHEN ma = 0 THEN 0
       |           ELSE CAST(floor(x * 127.0 / ma + 0.5) AS BIGINT) END) AS q
       |  FROM mxk
       |), ${sub(0)}, ${sub(1)}, ${sub(2)}, ${sub(3)},
       |codes AS (
       |  SELECT vec_id, 0 AS m, cl FROM s0asg UNION ALL
       |  SELECT vec_id, 1, cl FROM s1asg UNION ALL
       |  SELECT vec_id, 2, cl FROM s2asg UNION ALL
       |  SELECT vec_id, 3, cl FROM s3asg
       |), luts AS (
       |  SELECT qid, 0 AS m, cl, dotv FROM s0lut UNION ALL
       |  SELECT qid, 1, cl, dotv FROM s1lut UNION ALL
       |  SELECT qid, 2, cl, dotv FROM s2lut UNION ALL
       |  SELECT qid, 3, cl, dotv FROM s3lut
       |)""".stripMargin
  }

  def queries: Map[String, Q] = Map(

    // Product-quantization ANN (Jégou et al.; the FAISS memory-bound
    // structure) with asymmetric-distance (ADC) scoring, END-TO-END under
    // the exact oracle gate: int8 quantize → 4 independent 16-dim
    // subspace k-means (exact-integer spherical Lloyd's, two rounds) →
    // micro-unit mean codebooks → per-query 4×8-entry LUT of integer
    // dots → document score = Σ over its 4 CODE rows of LUT lookups —
    // an all-BIGINT ranking with no float boundary anywhere. Scale
    // shape: the corpus side of the scoring join carries ONLY (id,
    // subspace, code) — m·log₂k bits of payload per vector instead of d
    // floats (the entire point of PQ at 100 TB: the vector table stays
    // on disk, the scan reads codes); the LUT is nq·m·k rows and
    // broadcast; training state is m·k·subDim integers on the driver —
    // constant in corpus size, same contract as q_sim_kmeans.
    "q_sim_pq_topk" -> Q(
      t => {
        val emb = t.embeddings.select(col("vec_id").as("id"),
          Similarity.toDouble(col("embedding")).as("vec"))
        val qn = Similarity.prepareQuantized(emb)
        val codes = Similarity.pqCodes(qn, m = 4, subDim = 16, k = 8, iters = 2)
          .localCheckpoint(true) // feeds the codebook AND the scoring join
        val cb = Similarity.pqCodebook(qn, codes, m = 4, subDim = 16)
        val qsub = (0 until 4).map { i =>
          qn.filter(col("id") < 5).select(col("id").as("qid"),
            lit(i).cast("int").as("m"), slice(col("q"), i * 16 + 1, 16).as("qs"))
        }.reduce(_ unionByName _)
        val lut = qsub.join(cb, Seq("m"))
          .select(col("qid"), col("m"), col("code"),
            Similarity.intDot(col("qs"), col("cv")).as("dotv"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("qid")).orderBy(col("adc_dot").desc, col("cid"))
        codes.join(broadcast(lut), Seq("m", "code"))
          .filter(col("id") =!= col("qid"))
          .groupBy(col("qid"), col("id"))
          .agg(sum(col("dotv")).as("adc_dot"))
          .withColumnRenamed("id", "cid")
          .withColumn("rank", row_number().over(w).cast("long"))
          .filter(col("rank") <= 3)
          .select(col("qid"), col("rank"), col("cid"), col("adc_dot"))
          .orderBy(col("qid"), col("rank"), col("cid"), col("adc_dot"))
      },
      Some(s"""$duckPqCtes, scored AS (
               |  SELECT l.qid, c.vec_id AS cid, CAST(SUM(l.dotv) AS BIGINT) AS adc_dot
               |  FROM codes c JOIN luts l ON c.m = l.m AND c.cl = l.cl
               |  WHERE c.vec_id <> l.qid
               |  GROUP BY l.qid, c.vec_id
               |), ranked AS (
               |  SELECT qid, cid, adc_dot,
               |         row_number() OVER (PARTITION BY qid
               |                            ORDER BY adc_dot DESC, cid) AS rank
               |  FROM scored
               |)
               |SELECT qid, rank, cid, adc_dot FROM ranked WHERE rank <= 3
               |ORDER BY qid NULLS FIRST, rank NULLS FIRST, cid NULLS FIRST,
               |         adc_dot NULLS FIRST""".stripMargin)),

    // MMR diversity rerank (Carbonell & Goldstein 1998): greedy 3-pick from
    // a quantized-cosine top-10 shortlist per query, score = 0.7·rel −
    // 0.3·max-sim-to-selected. The oracle replays the greedy loop as three
    // CHAINED argmax CTEs (selectK is a fixed 3, so the recursion unrolls
    // into plain SQL — no recursive CTE needed) over the same integer-dot
    // cosine arithmetic; step 1's score is 0.7·rel on both sides, so no
    // −0.0 can arise to split the exact hash. The corpus is scanned once
    // (stage-1 shortlist); all greedy work is shortlist-sized.
    "q_sim_mmr_rerank" -> Q(
      t => {
        val emb = t.embeddings.select(col("vec_id").as("id"),
          Similarity.toDouble(col("embedding")).as("vec"))
        Similarity.mmrRerank(emb.filter(col("id") < 5), emb,
            shortlistK = 10, selectK = 3)
          .select(col("qid"), col("step"), col("cid"),
            round(col("score"), 4).as("score"))
          .orderBy(col("qid"), col("step"), col("cid"), col("score"))
      },
      Some(s"""$duckVecCte, mx AS (
               |  SELECT vec_id, v, list_max(list_transform(v, y -> abs(y))) AS ma
               |  FROM e
               |), qv AS (
               |  SELECT vec_id,
               |         list_transform(v, x -> CASE WHEN ma = 0 THEN 0
               |           ELSE CAST(floor(x * 127.0 / ma + 0.5) AS BIGINT) END) AS q
               |  FROM mx
               |), qnn AS (
               |  SELECT vec_id, q, ${duckDot("q", "q")} AS aa FROM qv
               |), sl AS (
               |  SELECT qid, cid, rel FROM (
               |    SELECT a.vec_id AS qid, b.vec_id AS cid,
               |           CAST(${duckDot("a.q", "b.q")} AS DOUBLE)
               |             / (sqrt(a.aa) * sqrt(b.aa)) AS rel,
               |           row_number() OVER (PARTITION BY a.vec_id ORDER BY
               |             CAST(${duckDot("a.q", "b.q")} AS DOUBLE)
               |               / (sqrt(a.aa) * sqrt(b.aa)) DESC, b.vec_id) AS rn
               |    FROM qnn a JOIN qnn b ON a.vec_id < 5 AND a.vec_id <> b.vec_id)
               |  WHERE rn <= 10
               |), ps AS (
               |  SELECT x.qid, x.cid AS a, y.cid AS b,
               |         CAST(${duckDot("xa.q", "ya.q")} AS DOUBLE)
               |           / (sqrt(xa.aa) * sqrt(ya.aa)) AS sim
               |  FROM sl x JOIN sl y ON x.qid = y.qid AND x.cid <> y.cid
               |  JOIN qnn xa ON xa.vec_id = x.cid
               |  JOIN qnn ya ON ya.vec_id = y.cid
               |), sel1 AS (
               |  SELECT qid, cid, CAST(1 AS BIGINT) AS step, score FROM (
               |    SELECT qid, cid, CAST(0.7 AS DOUBLE) * rel AS score,
               |           row_number() OVER (PARTITION BY qid
               |             ORDER BY CAST(0.7 AS DOUBLE) * rel DESC, cid) AS rn
               |    FROM sl)
               |  WHERE rn = 1
               |), ms2 AS (
               |  SELECT p.qid, p.a AS cid, max(p.sim) AS maxsim
               |  FROM ps p JOIN sel1 s ON p.qid = s.qid AND p.b = s.cid
               |  GROUP BY p.qid, p.a
               |), sel2 AS (
               |  SELECT qid, cid, CAST(2 AS BIGINT) AS step, score FROM (
               |    SELECT c.qid, c.cid,
               |           CAST(0.7 AS DOUBLE) * c.rel
               |             - CAST(0.3 AS DOUBLE) * m.maxsim AS score,
               |           row_number() OVER (PARTITION BY c.qid
               |             ORDER BY CAST(0.7 AS DOUBLE) * c.rel
               |               - CAST(0.3 AS DOUBLE) * m.maxsim DESC, c.cid) AS rn
               |    FROM sl c JOIN ms2 m ON c.qid = m.qid AND c.cid = m.cid
               |    WHERE NOT EXISTS (SELECT 1 FROM sel1 s
               |                      WHERE s.qid = c.qid AND s.cid = c.cid))
               |  WHERE rn = 1
               |), sel12 AS (
               |  SELECT qid, cid, step, score FROM sel1
               |  UNION ALL SELECT qid, cid, step, score FROM sel2
               |), ms3 AS (
               |  SELECT p.qid, p.a AS cid, max(p.sim) AS maxsim
               |  FROM ps p JOIN sel12 s ON p.qid = s.qid AND p.b = s.cid
               |  GROUP BY p.qid, p.a
               |), sel3 AS (
               |  SELECT qid, cid, CAST(3 AS BIGINT) AS step, score FROM (
               |    SELECT c.qid, c.cid,
               |           CAST(0.7 AS DOUBLE) * c.rel
               |             - CAST(0.3 AS DOUBLE) * m.maxsim AS score,
               |           row_number() OVER (PARTITION BY c.qid
               |             ORDER BY CAST(0.7 AS DOUBLE) * c.rel
               |               - CAST(0.3 AS DOUBLE) * m.maxsim DESC, c.cid) AS rn
               |    FROM sl c JOIN ms3 m ON c.qid = m.qid AND c.cid = m.cid
               |    WHERE NOT EXISTS (SELECT 1 FROM sel12 s
               |                      WHERE s.qid = c.qid AND s.cid = c.cid))
               |  WHERE rn = 1
               |)
               |SELECT qid, step, cid, ROUND(score, 4) AS score
               |FROM (SELECT * FROM sel12 UNION ALL SELECT * FROM sel3)
               |ORDER BY qid NULLS FIRST, step NULLS FIRST, cid NULLS FIRST,
               |         score NULLS FIRST""".stripMargin)),

    "q_sim_bruteforce_topk" -> Q(
      t => {
        val emb = t.embeddings.select(col("vec_id").as("id"),
          Similarity.toDouble(col("embedding")).as("vec"))
        Similarity.bruteForceTopKComposed(emb.filter(col("id") < 5), emb, k = 3)
          .select(col("qid"), col("rank"), col("cid"), round(col("sim"), 4).as("sim"))
          .orderBy(col("qid"), col("rank"), col("cid"), col("sim"))
      },
      Some(s"""$duckVecCte, scored AS (
               |  SELECT q.vec_id AS qid, c.vec_id AS cid,
               |         ${duckDot("q.v", "c.v")} / (q.nrm * c.nrm) AS sim
               |  FROM n q JOIN n c ON q.vec_id < 5 AND q.vec_id <> c.vec_id
               |), ranked AS (
               |  SELECT qid, cid, sim,
               |         row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rank
               |  FROM scored
               |)
               |SELECT qid, rank, cid, ROUND(sim, 4) AS sim
               |FROM ranked WHERE rank <= 3
               |ORDER BY qid NULLS FIRST, rank NULLS FIRST, cid NULLS FIRST, sim NULLS FIRST""".stripMargin)),

    // Native-kernel twin of q_sim_bruteforce_topk: the per-pair cosine runs
    // as ONE fused codegen loop (graft.functions.VectorKernels.cosine)
    // instead of three interpreted HOF folds — same left-to-right IEEE
    // accumulation, so the SAME DuckDB oracle gates it bit-for-bit
    // (VectorKernelSpec additionally proves pairwise equality of the two
    // forms over every embedding pair).
    "q_sim_bruteforce_topk_native" -> Q(
      t => {
        val emb = t.embeddings.select(col("vec_id").as("id"),
          Similarity.toDouble(col("embedding")).as("vec"))
        Similarity.bruteForceTopK(emb.filter(col("id") < 5), emb, k = 3)
          .select(col("qid"), col("rank"), col("cid"), round(col("sim"), 4).as("sim"))
          .orderBy(col("qid"), col("rank"), col("cid"), col("sim"))
      },
      Some(s"""$duckVecCte, scored AS (
               |  SELECT q.vec_id AS qid, c.vec_id AS cid,
               |         ${duckDot("q.v", "c.v")} / (q.nrm * c.nrm) AS sim
               |  FROM n q JOIN n c ON q.vec_id < 5 AND q.vec_id <> c.vec_id
               |), ranked AS (
               |  SELECT qid, cid, sim,
               |         row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rank
               |  FROM scored
               |)
               |SELECT qid, rank, cid, ROUND(sim, 4) AS sim
               |FROM ranked WHERE rank <= 3
               |ORDER BY qid NULLS FIRST, rank NULLS FIRST, cid NULLS FIRST, sim NULLS FIRST""".stripMargin)),

    // k-NN classification eval — the non-parametric sibling of
    // q_sim_nearest_centroid's prototype classifier: each sampled query
    // takes its 5 nearest neighbors' majority label (ties to the lowest
    // label — deterministic), scored as a (label, predicted) confusion
    // matrix. Embedding-quality probes like this decide whether a space
    // is good enough to drive semantic dedup. Scale shape: the candidate
    // expansion is bounded by |queries|·|corpus| with the query side a
    // fixed broadcast sample (the brute-force contract); production
    // swaps in the IVF/LSH candidate generators under the same vote.
    "q_sim_knn_eval" -> Q(
      t => {
        val emb = t.embeddings.select(col("vec_id").as("id"),
          Similarity.toDouble(col("embedding")).as("vec"))
        val labels = t.embeddings.select(col("vec_id"), col("label"))
        val nb = Similarity.bruteForceTopK(emb.filter(col("id") < 50), emb, k = 5)
          .join(labels.select(col("vec_id").as("cid"),
            col("label").cast("long").as("nlabel")), "cid")
        val votes = nb.groupBy(col("qid"), col("nlabel"))
          .agg(count(lit(1)).as("nv"))
        val win = org.apache.spark.sql.expressions.Window
          .partitionBy(col("qid")).orderBy(col("nv").desc, col("nlabel"))
        val pred = votes
          .withColumn("rn", row_number().over(win))
          .filter(col("rn") === 1)
          .select(col("qid"), col("nlabel").as("predicted"))
        pred.join(labels.select(col("vec_id").as("qid"),
            col("label").cast("long").as("true_label")), "qid")
          .groupBy(col("true_label"), col("predicted"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("true_label"), col("predicted"))
      },
      Some(s"""$duckVecCte, scored AS (
               |  SELECT q.vec_id AS qid, c.vec_id AS cid, c.label AS nlabel,
               |         ${duckDot("q.v", "c.v")} / (q.nrm * c.nrm) AS sim
               |  FROM n q JOIN n c ON q.vec_id < 50 AND q.vec_id <> c.vec_id
               |), ranked AS (
               |  SELECT qid, nlabel,
               |         row_number() OVER (PARTITION BY qid
               |           ORDER BY sim DESC, cid) AS rank
               |  FROM scored
               |), votes AS (
               |  SELECT qid, CAST(nlabel AS BIGINT) AS nlabel,
               |         CAST(COUNT(*) AS BIGINT) AS nv
               |  FROM ranked WHERE rank <= 5 GROUP BY 1, 2
               |), pred AS (
               |  SELECT qid, nlabel AS predicted FROM (
               |    SELECT qid, nlabel,
               |           row_number() OVER (PARTITION BY qid
               |             ORDER BY nv DESC, nlabel) AS rn
               |    FROM votes)
               |  WHERE rn = 1
               |)
               |SELECT CAST(e.label AS BIGINT) AS true_label, p.predicted,
               |       CAST(COUNT(*) AS BIGINT) AS n
               |FROM pred p JOIN e ON p.qid = e.vec_id
               |GROUP BY 1, 2
               |ORDER BY true_label NULLS FIRST, predicted NULLS FIRST""".stripMargin)),

    "q_sim_ivf_topk" -> Q(
      t => {
        val emb = t.embeddings.select(col("vec_id").as("id"),
          Similarity.toDouble(col("embedding")).as("vec"))
        Similarity.bucketedTopK(emb.filter(col("id") < 20), emb, k = 3, nbits = 4)
          .select(col("qid"), col("rank"), col("cid"), round(col("sim"), 4).as("sim"))
          .orderBy(col("qid"), col("rank"), col("cid"), col("sim"))
      },
      Some(s"""$duckVecCte, b AS (
               |  SELECT vec_id, v, nrm,
               |         CAST(list_sum(list_transform(range(0, 4), i ->
               |           CASE WHEN v[i + 1] >= 0 THEN CAST(pow(2, i) AS BIGINT)
               |                ELSE 0 END)) AS BIGINT) AS bucket
               |  FROM n
               |), scored AS (
               |  SELECT q.vec_id AS qid, c.vec_id AS cid,
               |         ${duckDot("q.v", "c.v")} / (q.nrm * c.nrm) AS sim
               |  FROM b q JOIN b c ON q.bucket = c.bucket
               |  WHERE q.vec_id < 20 AND q.vec_id <> c.vec_id
               |), ranked AS (
               |  SELECT qid, cid, sim,
               |         row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rank
               |  FROM scored
               |)
               |SELECT qid, rank, cid, ROUND(sim, 4) AS sim
               |FROM ranked WHERE rank <= 3
               |ORDER BY qid NULLS FIRST, rank NULLS FIRST, cid NULLS FIRST, sim NULLS FIRST""".stripMargin)),

    // Int8-quantized top-k: the 100 TB memory lever (4× smaller corpus than
    // float32). Scoring is an int64 dot of int8 codes — exact integer
    // arithmetic, so unlike the float variants the oracle needs no fold-order
    // contract at all: any evaluation order gives the same BIGINT.
    "q_sim_quantized_topk" -> Q(
      t => {
        val emb = t.embeddings.select(col("vec_id").as("id"),
          Similarity.toDouble(col("embedding")).as("vec"))
        Similarity.quantizedTopK(emb.filter(col("id") < 5), emb, k = 3)
          .select(col("qid"), col("rank"), col("cid"), col("qdot"),
            round(col("qcos"), 4).as("qcos"))
          .orderBy(col("qid"), col("rank"), col("cid"), col("qdot"), col("qcos"))
      },
      Some(s"""$duckVecCte, mx AS (
               |  SELECT vec_id, v, list_max(list_transform(v, y -> abs(y))) AS ma
               |  FROM e
               |), qv AS (
               |  SELECT vec_id,
               |         list_transform(v, x -> CASE WHEN ma = 0 THEN 0
               |           ELSE CAST(floor(x * 127.0 / ma + 0.5) AS BIGINT) END) AS q
               |  FROM mx
               |), qn AS (
               |  SELECT vec_id, q,
               |         list_reduce(list_transform(range(1, len(q) + 1), k -> q[k] * q[k]),
               |                     (acc, x) -> acc + x) AS aa
               |  FROM qv
               |), scored AS (
               |  SELECT a.vec_id AS qid, b.vec_id AS cid,
               |         list_reduce(list_transform(range(1, len(a.q) + 1), k -> a.q[k] * b.q[k]),
               |                     (acc, x) -> acc + x) AS qdot,
               |         a.aa AS qaa, b.aa AS caa
               |  FROM qn a JOIN qn b ON a.vec_id < 5 AND a.vec_id <> b.vec_id
               |), ranked AS (
               |  SELECT qid, cid, qdot,
               |         CAST(qdot AS DOUBLE) / (sqrt(qaa) * sqrt(caa)) AS qcos,
               |         row_number() OVER (PARTITION BY qid
               |           ORDER BY CAST(qdot AS DOUBLE) / (sqrt(qaa) * sqrt(caa)) DESC, cid) AS rank
               |  FROM scored
               |)
               |SELECT qid, rank, cid, qdot, ROUND(qcos, 4) AS qcos
               |FROM ranked WHERE rank <= 3
               |ORDER BY qid NULLS FIRST, rank NULLS FIRST, cid NULLS FIRST,
               |         qdot NULLS FIRST, qcos NULLS FIRST""".stripMargin)),

    // Multi-table LSH: the production ANN path. Candidate generation is
    // probabilistic-by-construction but fully deterministic here (splitmix64
    // avalanche hyperplanes — Similarity.hyperplane). Replaying the hyperplane
    // folds in DuckDB SQL is impractically slow, so the oracle is instead the
    // exact brute-force top-k, which is only valid because recall is
    // OBSERVED to be 1.0 on the driver's actual inputs: SimilaritySpec
    // asserts lshTopK == bruteForceTopK at EVERY testdata sf (0.001/0.01/
    // 0.1) before any snapshot ships. The probability estimate alone is NOT
    // the guarantee — a low-cosine rank-3 neighbor misses nbits=2 × 20
    // tables with ~(3/4)^20 ≈ 3e-3, and negative-cosine neighbors more — so
    // on a NEW dataset this oracle pairing must be re-validated by that
    // spec, or the entry demoted to rows-only.
    "q_sim_lsh_topk" -> Q(
      t => {
        val emb = t.embeddings.select(col("vec_id").as("id"),
          Similarity.toDouble(col("embedding")).as("vec"))
        Similarity.lshTopK(emb.filter(col("id") < 20), emb, k = 3, dims = 64,
          nbits = 2, nTables = 20)
          .select(col("qid"), col("rank"), col("cid"), round(col("sim"), 4).as("sim"))
          .orderBy(col("qid"), col("rank"), col("cid"), col("sim"))
      },
      Some(s"""$duckVecCte, scored AS (
               |  SELECT q.vec_id AS qid, c.vec_id AS cid,
               |         ${duckDot("q.v", "c.v")} / (q.nrm * c.nrm) AS sim
               |  FROM n q JOIN n c ON q.vec_id < 20 AND q.vec_id <> c.vec_id
               |), ranked AS (
               |  SELECT qid, cid, sim,
               |         row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rank
               |  FROM scored
               |)
               |SELECT qid, rank, cid, ROUND(sim, 4) AS sim
               |FROM ranked WHERE rank <= 3
               |ORDER BY qid NULLS FIRST, rank NULLS FIRST, cid NULLS FIRST, sim NULLS FIRST""".stripMargin)),

    // All-pairs exact near-dup — the ORACLE BASELINE ONLY (hence the
    // baseline_ catalog prefix, r9 verdict task 5): O(n²) pairs is a
    // scale-killer at 100 TB; the production formulation is
    // q_sim_near_dup_lsh below (same result, candidate-bounded shuffle).
    "baseline_sim_near_dup" -> Q(
      t => {
        val emb = t.embeddings.select(col("vec_id"),
          Similarity.toDouble(col("embedding")).as("v"))
        emb.as("x").join(emb.as("y"), col("x.vec_id") < col("y.vec_id"))
          .withColumn("sim", Similarity.cosine(col("x.v"), col("y.v")))
          .filter(col("sim") >= 0.4)
          .select(col("x.vec_id").as("a"), col("y.vec_id").as("b"),
            round(col("sim"), 4).as("sim"))
          .orderBy(col("a"), col("b"), col("sim"))
      },
      Some(s"""$duckVecCte
               |SELECT x.vec_id AS a, y.vec_id AS b,
               |       ROUND(${duckDot("x.v", "y.v")} / (x.nrm * y.nrm), 4) AS sim
               |FROM n x JOIN n y ON x.vec_id < y.vec_id
               |WHERE ${duckDot("x.v", "y.v")} / (x.nrm * y.nrm) >= 0.4
               |ORDER BY a NULLS FIRST, b NULLS FIRST, sim NULLS FIRST""".stripMargin)),

    // The scale-safe formulation: LSH candidate pairs + exact verify. The
    // oracle is the ALL-PAIRS query — valid because recall is OBSERVED to
    // be 1.0 on the driver's actual inputs: SimilaritySpec asserts
    // lshNearDupPairs == all-pairs at EVERY testdata sf (0.001/0.01/0.1),
    // so a parameter or dataset regression fails locally before the driver.
    "q_sim_near_dup_lsh" -> Q(
      t => {
        val emb = t.embeddings.select(col("vec_id"),
          Similarity.toDouble(col("embedding")).as("v"))
        Similarity.lshNearDupPairs(emb, threshold = 0.4, dims = 64)
          .select(col("a"), col("b"), round(col("sim"), 4).as("sim"))
          .orderBy(col("a"), col("b"), col("sim"))
      },
      Some(s"""$duckVecCte
               |SELECT x.vec_id AS a, y.vec_id AS b,
               |       ROUND(${duckDot("x.v", "y.v")} / (x.nrm * y.nrm), 4) AS sim
               |FROM n x JOIN n y ON x.vec_id < y.vec_id
               |WHERE ${duckDot("x.v", "y.v")} / (x.nrm * y.nrm) >= 0.4
               |ORDER BY a NULLS FIRST, b NULLS FIRST, sim NULLS FIRST""".stripMargin)),

    "q_sim_label_centroid" -> Q(
      t => t.embeddings
        .select(col("label"), posexplode(Similarity.toDouble(col("embedding"))).as(Seq("pos", "x")))
        .groupBy(col("label"), col("pos"))
        // decimal-exact mean: a double avg's partial-merge order is
        // nondeterministic; DECIMAL(38,20) holds the per-dimension sums of
        // float-valued terms with margin, making the mean bit-stable.
        .agg((sum(col("x").cast("decimal(38,20)")).cast("double") / count(col("x"))).as("m"))
        .groupBy(col("label"))
        .agg(
          count(lit(1)).as("dim"),
          sort_array(collect_list(struct(col("pos"), col("m")))).as("ms"))
        .select(
          col("label"), col("dim"),
          round(sqrt(aggregate(col("ms"), lit(0.0),
            (acc, s) => acc + s.getField("m") * s.getField("m"))), 4).as("centroid_norm"))
        .orderBy(col("label"), col("dim"), col("centroid_norm")),
      Some("""WITH dims AS (
              |  SELECT label,
              |         CAST(generate_subscripts(embedding, 1) - 1 AS INTEGER) AS pos,
              |         CAST(unnest(embedding) AS DOUBLE) AS x
              |  FROM embeddings
              |), cent AS (
              |  SELECT label, pos,
              |         CAST(SUM(CAST(x AS DECIMAL(38,20))) AS DOUBLE) / COUNT(x) AS m
              |  FROM dims GROUP BY label, pos
              |), packed AS (
              |  SELECT label, COUNT(*) AS dim, list(m ORDER BY pos) AS ms FROM cent GROUP BY label
              |)
              |SELECT label, dim,
              |       ROUND(sqrt(list_reduce(list_transform(ms, m -> m * m), (acc, x) -> acc + x)), 4) AS centroid_norm
              |FROM packed
              |ORDER BY label NULLS FIRST, dim NULLS FIRST, centroid_norm NULLS FIRST""".stripMargin)),

    // Nearest-centroid classification — the confusion matrix of true label
    // vs nearest LABEL CENTROID, the cheapest embedding-quality eval a
    // curation pipeline runs (is the embedding space linearly separable
    // enough to trust for semantic dedup / mixture balancing?). Numeric
    // contract is the kmeansAssign one: centroids are per-dimension int64
    // SUMS of int8 codes (order-independent, never float means), the score
    // intDot/sqrt(cc) is one IEEE division+sqrt over exact integers, ties
    // break to the lowest label. Scale shape: centroids are L·d scalars —
    // a broadcast literal frame — so assignment is one map-side-scored
    // broadcast nested-loop over L rows, the per-id argmax window sees L
    // rows per vector, and the confusion matrix is an ≤L² group aggregate.
    "q_sim_nearest_centroid" -> Q(
      t => {
        val emb = t.embeddings.select(col("vec_id").as("id"),
          col("label").cast("long").as("label"),
          Similarity.toDouble(col("embedding")).as("vec"))
        val qn = emb.withColumn("__ma", Similarity.maxAbs(col("vec")))
          .select(col("id"), col("label"),
            Similarity.quantize(col("vec"), col("__ma")).as("q"))
        val cent = qn
          .select(col("label").as("clabel"), posexplode(col("q")).as(Seq("pos", "v")))
          .groupBy(col("clabel"), col("pos")).agg(sum(col("v")).as("s"))
          .groupBy(col("clabel"))
          .agg(transform(array_sort(collect_list(struct(col("pos"), col("s")))),
            x => x.getField("s")).as("c"))
          .withColumn("cc", Similarity.intDot(col("c"), col("c")))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("id")).orderBy(col("score").desc, col("clabel"))
        qn.crossJoin(broadcast(cent))
          .withColumn("score",
            Similarity.intDot(col("q"), col("c")).cast("double") /
              sqrt(col("cc").cast("double")))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .groupBy(col("label"), col("clabel").as("pred"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("label"), col("pred"), col("n"))
      },
      Some(s"""$duckVecCte, mxk AS (
               |  SELECT vec_id, CAST(label AS BIGINT) AS label, v,
               |         list_max(list_transform(v, y -> abs(y))) AS ma
               |  FROM e
               |), qkv AS (
               |  SELECT vec_id, label,
               |         list_transform(v, x -> CASE WHEN ma = 0 THEN 0
               |           ELSE CAST(floor(x * 127.0 / ma + 0.5) AS BIGINT) END) AS q
               |  FROM mxk
               |), csum AS (
               |  SELECT label AS clabel, t.i AS i, CAST(SUM(q[t.i]) AS BIGINT) AS s
               |  FROM qkv CROSS JOIN range(1, 65) AS t(i)
               |  GROUP BY label, t.i
               |), cent AS (
               |  SELECT clabel, list(s ORDER BY i) AS c FROM csum GROUP BY clabel
               |), centn AS (
               |  SELECT clabel, c, ${duckDot("c", "c")} AS cc FROM cent
               |), scored AS (
               |  SELECT v.vec_id, v.label, x.clabel,
               |         row_number() OVER (PARTITION BY v.vec_id ORDER BY
               |           CAST(${duckDot("v.q", "x.c")} AS DOUBLE) /
               |             sqrt(CAST(x.cc AS DOUBLE)) DESC, x.clabel) AS rn
               |  FROM qkv v CROSS JOIN centn x
               |)
               |SELECT label, clabel AS pred, CAST(COUNT(*) AS BIGINT) AS n
               |FROM scored WHERE rn = 1
               |GROUP BY label, clabel
               |ORDER BY label NULLS FIRST, pred NULLS FIRST, n NULLS FIRST""".stripMargin)),

    // Quantized spherical k-means (two Lloyd iterations, k = 8): the
    // clustering behind semantic dedup and IVF cell maps at corpus scale.
    // See operators/Similarity.kmeansAssign for the scale shape (map-side
    // assignment against broadcast-literal centroids; one k·d-sized
    // partial-agg shuffle per iteration) and the integer-sum numeric
    // contract that makes this oracle-exact across engines.
    "q_sim_kmeans" -> Q(
      t => {
        val emb = t.embeddings.select(col("vec_id").as("id"),
          Similarity.toDouble(col("embedding")).as("vec"))
        Similarity.kmeansAssign(Similarity.prepareQuantized(emb), k = 8, iters = 2)
          .select(col("id").as("vec_id"), col("cluster").cast("long").as("cluster"))
          .orderBy(col("vec_id"), col("cluster"))
      },
      Some(s"""$duckKmeansCtes
               |SELECT vec_id, cl AS cluster FROM asg
               |ORDER BY vec_id NULLS FIRST, cluster NULLS FIRST""".stripMargin)),

    // Semantic near-dup pairs via k-means blocking: score only same-cluster
    // pairs — the embedding analogue of LSH banding. At corpus scale the
    // all-pairs product never materializes; the pair space shrinks from
    // O(n²) to Σ|cluster|², bounded BY CONSTRUCTION because k scales with
    // the corpus: k = Similarity.blockCount(n) = max(8, ceil(n/4096)) pins
    // the expected block size, so Σ|cluster|² grows linearly in n (see the
    // blockCount scaladoc; KmeansSpec asserts the bound on replicated
    // data). At the gate scales (500 / 2 000 embeddings) blockCount
    // resolves to 8, so the pinned k = 8 oracle below replays the blocked
    // pair set exactly, not statistically.
    "q_sim_semantic_dedup" -> Q(
      t => {
        val emb = t.embeddings.select(col("vec_id").as("id"),
          Similarity.toDouble(col("embedding")).as("vec"))
        val qn = Similarity.prepareQuantized(emb)
        val k = Similarity.blockCount(qn.count()) // cheap: qn is eagerly checkpointed
        val z = qn.join(Similarity.kmeansAssign(qn, k, iters = 2), "id")
        val x = z.select(col("id").as("a"), col("q").as("qa"),
          col("aa").as("aaa"), col("cluster"))
        val y = z.select(col("id").as("b"), col("q").as("qb"),
          col("aa").as("aab"), col("cluster").as("__clb"))
        x.join(y, col("cluster") === col("__clb") && col("a") < col("b"))
          .withColumn("qcos", Similarity.intDot(col("qa"), col("qb")).cast("double") /
            (sqrt(col("aaa")) * sqrt(col("aab"))))
          .filter(col("qcos") >= 0.35)
          .select(col("a"), col("b"), col("cluster").cast("long").as("cluster"),
            round(col("qcos"), 4).as("qcos"))
          .orderBy(col("a"), col("b"), col("cluster"), col("qcos"))
      },
      Some(s"""$duckKmeansCtes
               |SELECT x.vec_id AS a, y.vec_id AS b, x.cl AS cluster,
               |       ROUND(CAST(${duckDot("x.q", "y.q")} AS DOUBLE) /
               |             (sqrt(x.aa) * sqrt(y.aa)), 4) AS qcos
               |FROM asg x JOIN asg y ON x.cl = y.cl AND x.vec_id < y.vec_id
               |WHERE CAST(${duckDot("x.q", "y.q")} AS DOUBLE) /
               |      (sqrt(x.aa) * sqrt(y.aa)) >= 0.35
               |ORDER BY a NULLS FIRST, b NULLS FIRST, cluster NULLS FIRST,
               |         qcos NULLS FIRST""".stripMargin)),

    // Hard-negative mining (operators/Similarity.hardNegatives): for each
    // of 8 query vectors, the 5 most-cosine-similar vectors with a
    // DIFFERENT label — the contrastive-training near-miss set. The oracle
    // replays the int8-quantize → exact-int64-dot → IEEE-cosine contract
    // (same CTE skeleton as q_sim_quantized_topk); ranking ties are broken
    // by cid on both engines, and the quantized cosine of exact integers
    // is bit-identical, so rank order is engine-portable.
    "q_sim_hard_negatives" -> Q(
      t => {
        val emb = t.embeddings.select(col("vec_id").as("id"),
          Similarity.toDouble(col("embedding")).as("vec"), col("label"))
        Similarity.hardNegatives(emb.filter(col("id") < 8), emb, k = 5)
          .select(col("qid"), col("rank"), col("cid"),
            col("clabel").cast("long").as("clabel"), col("qdot"),
            round(col("qcos"), 4).as("qcos"))
          .orderBy(col("qid"), col("rank"), col("cid"))
      },
      Some(s"""$duckVecCte, mxh AS (
               |  SELECT vec_id, v, label,
               |         list_max(list_transform(v, y -> abs(y))) AS ma
               |  FROM e
               |), qvh AS (
               |  SELECT vec_id, label,
               |         list_transform(v, x -> CASE WHEN ma = 0 THEN 0
               |           ELSE CAST(floor(x * 127.0 / ma + 0.5) AS BIGINT) END) AS q
               |  FROM mxh
               |), qnh AS (
               |  SELECT vec_id, label, q,
               |         list_reduce(list_transform(range(1, len(q) + 1), k -> q[k] * q[k]),
               |                     (acc, x) -> acc + x) AS aa
               |  FROM qvh
               |), scoredh AS (
               |  SELECT a.vec_id AS qid, b.vec_id AS cid, b.label AS clabel,
               |         list_reduce(list_transform(range(1, len(a.q) + 1), k -> a.q[k] * b.q[k]),
               |                     (acc, x) -> acc + x) AS qdot,
               |         a.aa AS qaa, b.aa AS caa
               |  FROM qnh a JOIN qnh b ON a.vec_id < 8 AND a.label <> b.label
               |), rankedh AS (
               |  SELECT qid, cid, clabel, qdot,
               |         CAST(qdot AS DOUBLE) / (sqrt(qaa) * sqrt(caa)) AS qcos,
               |         row_number() OVER (PARTITION BY qid
               |           ORDER BY CAST(qdot AS DOUBLE) / (sqrt(qaa) * sqrt(caa)) DESC,
               |                    cid) AS rank
               |  FROM scoredh
               |)
               |SELECT qid, CAST(rank AS BIGINT) AS rank, cid,
               |       CAST(clabel AS BIGINT) AS clabel, qdot,
               |       ROUND(qcos, 4) AS qcos
               |FROM rankedh WHERE rank <= 5
               |ORDER BY qid NULLS FIRST, rank NULLS FIRST, cid NULLS FIRST""".stripMargin)),

    // ANN quality audit — recall@3 of the sign-bucketed index against the
    // brute-force ground truth, per query, as exact integer micro-units
    // (the q_dedup_minhash_est discipline applied to vector search: the
    // approximation ITSELF is under the oracle gate, so a silent recall
    // regression — bucketing bug, tie-break drift — fails correctness, not
    // just quality). Both arms reuse the existing operators; the semi-join
    // intersects per-query top-3 sets, and queries with zero hits are kept
    // through the left join. Scale: the audit runs on a sampled query set
    // (here the 20-query side), so the brute-force arm is bounded — the
    // standard recall-estimation shape at any corpus size.
    "q_sim_recall_audit" -> Q(
      t => {
        val emb = t.embeddings.select(col("vec_id").as("id"),
          Similarity.toDouble(col("embedding")).as("vec"))
        val qs = emb.filter(col("id") < 20)
        val bf = Similarity.bruteForceTopK(qs, emb, k = 3)
          .select(col("qid"), col("cid"))
        val iv = Similarity.bucketedTopK(qs, emb, k = 3, nbits = 4)
          .select(col("qid").as("iqid"), col("cid").as("icid"))
        val hits = bf
          .join(iv, col("qid") === col("iqid") && col("cid") === col("icid"), "left_semi")
          .groupBy(col("qid")).agg(count(lit(1)).as("n_hit"))
        qs.select(col("id").as("qid"))
          .join(hits, Seq("qid"), "left")
          .select(col("qid"), coalesce(col("n_hit"), lit(0L)).as("n_hit"))
          .withColumn("recall_micro", expr("n_hit * 1000000L div 3"))
          .orderBy(col("qid"), col("n_hit"), col("recall_micro"))
      },
      Some(s"""$duckVecCte, scored_bf AS (
               |  SELECT q.vec_id AS qid, c.vec_id AS cid,
               |         ${duckDot("q.v", "c.v")} / (q.nrm * c.nrm) AS sim
               |  FROM n q JOIN n c ON q.vec_id < 20 AND q.vec_id <> c.vec_id
               |), bf AS (
               |  SELECT qid, cid FROM (
               |    SELECT qid, cid,
               |           row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rank
               |    FROM scored_bf) WHERE rank <= 3
               |), b AS (
               |  SELECT vec_id, v, nrm,
               |         CAST(list_sum(list_transform(range(0, 4), i ->
               |           CASE WHEN v[i + 1] >= 0 THEN CAST(pow(2, i) AS BIGINT)
               |                ELSE 0 END)) AS BIGINT) AS bucket
               |  FROM n
               |), scored_iv AS (
               |  SELECT q.vec_id AS qid, c.vec_id AS cid,
               |         ${duckDot("q.v", "c.v")} / (q.nrm * c.nrm) AS sim
               |  FROM b q JOIN b c ON q.bucket = c.bucket
               |  WHERE q.vec_id < 20 AND q.vec_id <> c.vec_id
               |), iv AS (
               |  SELECT qid, cid FROM (
               |    SELECT qid, cid,
               |           row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rank
               |    FROM scored_iv) WHERE rank <= 3
               |), hits AS (
               |  SELECT bf.qid, COUNT(*) AS n_hit
               |  FROM bf JOIN iv ON bf.qid = iv.qid AND bf.cid = iv.cid
               |  GROUP BY bf.qid
               |)
               |SELECT q.vec_id AS qid,
               |       CAST(COALESCE(h.n_hit, 0) AS BIGINT) AS n_hit,
               |       CAST(COALESCE(h.n_hit, 0) * 1000000 // 3 AS BIGINT) AS recall_micro
               |FROM n q LEFT JOIN hits h ON q.vec_id = h.qid
               |WHERE q.vec_id < 20
               |ORDER BY qid NULLS FIRST, n_hit NULLS FIRST, recall_micro NULLS FIRST""".stripMargin)),

    // Per-dimension z-score feature normalization — the standard embedding
    // preprocessing pass (zero-mean/unit-variance per dim before
    // quantization or distance work). Determinism discipline: values are
    // quantized to exact micro-unit BIGINTs (floor(x·10⁶ + 0.5) — the
    // catalog's engine-portable quantizer), per-dim count/sum/sum-of-
    // squares aggregate EXACTLY in int64, and mean/variance/z are then a
    // FIXED sequence of IEEE-correctly-rounded double ops (+,-,*,/,sqrt —
    // no libm), spelled identically in the oracle; variance is
    // E[m²]−E[m]² in doubles because n·Σm² overflows int64 at sf0.1.
    // Scale shape: one narrow explode, one 64-group partial agg (the
    // moments), broadcast of 64 rows back, map-side normalize — the
    // canonical two-pass scaler; output bounded to dims 0-7.
    // Johnson–Lindenstrauss random signed projection (Achlioptas 2003 —
    // the ±1 database-friendly variant): 64-dim embeddings compressed to
    // 16 dims by a deterministic sign matrix derived from the repo's
    // md5-draw convention (first hex nibble ≤ '7' → +1), so both engines
    // materialize the SAME matrix with no RNG state. Components are exact
    // micro-unit BIGINTs: y_p = Σ_j sign(p,j)·q(x_j) — integer products
    // and sums only, no float accumulation order. Scale shape: the sign
    // matrix is a 1024-row broadcast dim; the corpus side is one 64×
    // posexplode + broadcast join + (vec, p) hash aggregate with partial
    // combine — linear in corpus size, and the projection REPLACES a 4×
    // wider vector downstream (the point of JL at 100 TB: every
    // subsequent ANN pass pays d=16, not 64, with distances preserved
    // within 1±ε).
    "q_sim_random_projection" -> Q(
      t => {
        val spark = t.spark
        val signs = spark.range(16).select(col("id").as("p"))
          .crossJoin(spark.range(64).select(col("id").as("j")))
          .select(col("p"), col("j"),
            when(substring(md5(concat(lit("rp:"), col("p").cast("string"),
              lit(":"), col("j").cast("string")).cast("binary")), 1, 1) <= "7", 1L)
              .otherwise(-1L).as("sign"))
        val ex = t.embeddings
          .select(col("vec_id"),
            posexplode(graft.operators.Similarity.toDouble(col("embedding"))))
          .select(col("vec_id"), col("pos").cast("long").as("j"),
            floor(col("col") * 1000000 + 0.5).cast("long").as("q"))
        ex.join(broadcast(signs), "j")
          .groupBy(col("vec_id"), col("p"))
          .agg(sum(col("sign") * col("q")).as("y_micro"))
          .orderBy(col("vec_id"), col("p"))
      },
      Some("""WITH signs AS (
              |  SELECT p, j,
              |         CASE WHEN substring(md5('rp:' || CAST(p AS VARCHAR)
              |           || ':' || CAST(j AS VARCHAR)), 1, 1) <= '7'
              |           THEN CAST(1 AS BIGINT) ELSE CAST(-1 AS BIGINT) END AS sign
              |  FROM (SELECT unnest(range(0, 16)) AS p)
              |  CROSS JOIN (SELECT unnest(range(0, 64)) AS j)
              |), ex AS (
              |  SELECT vec_id,
              |         CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS j,
              |         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000 + 0.5)
              |           AS BIGINT) AS q
              |  FROM embeddings
              |)
              |SELECT vec_id, p, CAST(SUM(sign * q) AS BIGINT) AS y_micro
              |FROM ex JOIN signs USING (j)
              |GROUP BY vec_id, p
              |ORDER BY vec_id NULLS FIRST, p NULLS FIRST""".stripMargin)),

    "q_sim_zscore" -> Q(
      t => {
        val ex = t.embeddings
          .select(col("vec_id"), posexplode(graft.operators.Similarity.toDouble(col("embedding"))))
          .filter(col("pos") < 8)
          .select(col("vec_id"), col("pos"),
            floor(col("col") * 1000000 + 0.5).cast("long").as("m"))
        val moments = ex.groupBy(col("pos")).agg(
          count(lit(1)).as("n"), sum(col("m")).as("s"),
          sum(col("m") * col("m")).as("s2"))
        val mean = col("s").cast("double") / col("n")
        val std = sqrt(col("s2").cast("double") / col("n") - mean * mean)
        ex.join(broadcast(moments), "pos")
          .select(col("vec_id"), col("pos"),
            round((col("m").cast("double") - mean) / std, 6))
          .toDF("vec_id", "pos", "z")
          .orderBy(col("vec_id"), col("pos"))
      },
      Some("""WITH ex AS (
             |  SELECT vec_id,
             |         CAST(generate_subscripts(embedding, 1) - 1 AS INTEGER) AS pos,
             |         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS m
             |  FROM embeddings
             |), exf AS (
             |  SELECT * FROM ex WHERE pos < 8
             |), mo AS (
             |  SELECT pos, COUNT(*) AS n, SUM(m) AS s, SUM(m * m) AS s2
             |  FROM exf GROUP BY pos
             |)
             |SELECT vec_id, pos,
             |       round((CAST(m AS DOUBLE) - CAST(s AS DOUBLE) / n)
             |         / sqrt(CAST(s2 AS DOUBLE) / n
             |                - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n))
             |         * 1000000) / 1000000 AS z
             |FROM exf JOIN mo USING (pos)
             |ORDER BY vec_id NULLS FIRST, pos NULLS FIRST""".stripMargin)),

    // Covariance moments over the embedding dimensions — the PCA/whitening
    // preparation primitive: the full upper-triangle d(d+1)/2 co-moment
    // matrix in ONE corpus pass. The co-moment n·Σxy − Σx·Σy is kept in
    // scaled INTEGER units (vectors quantized to 1e4 units: |m| ≤ ~6k).
    // Overflow bound: the combination terms n·Σxy and Σx·Σy grow as
    // n²·m² — QUADRATIC in corpus size — so int64 holds to n ≈ 5e5
    // vectors at this quantization (~250× the gated corpus); past that,
    // coarsen the unit (m/10 buys 100× in n) or lift the combination to
    // DECIMAL(38,0), which both engines sum exactly — covariance
    // needs one division by n·(n−1) the consumer can apply; leaving it
    // multiplicative keeps the gate division-free. Scale shape: the pair
    // expansion is NARROW — two CHAINED codegen'd generators (posexplode
    // the quantized vector, then posexplode each element's tail slice),
    // so every product is emitted by generated code with no self-join and
    // no shuffle of vector data; the only exchange is the d²-group
    // partial aggregate, whose width is bounded by the DIMENSION, not the
    // corpus. Measured against the alternatives at sf0.1 (AbBench): the
    // lambda/HOF struct expansion runs ~3.4× slower (higher-order
    // transforms evaluate interpreted per element), and the per-vector
    // relational self-join is faster still locally only because AQE
    // broadcasts the exploded side — at 100 TB that join degrades to
    // shuffling the n·d exploded corpus twice, while this plan's shuffle
    // stays d²-bounded forever. The oracle derives the same moments from
    // the per-vector self-join — proving the generator expansion against
    // the relational formulation. d ≤ a few hundred is the intended
    // envelope (d² agg state per task); beyond that, block the dimension
    // pairs.
    "q_sim_covariance" -> Q(
      t => {
        // r18 optimization, three plan-level cuts with identical results:
        // (1) the float→double cast and the quantize floor are ONE fused
        //     lambda (the nested transform(transform(...)) materialized an
        //     intermediate double array per row);
        // (2) `qa` is projected ONCE below the first generator — the old
        //     select(q.as("qa"), posexplode(q)) evaluated the interpreted
        //     quantize lambda twice per row (generator input + project);
        // (3) the moment sums need NO second/third corpus pass: vectors
        //     share one dimension d, so every vector contributes exactly
        //     one row to each (i, j) group — within a group, sum(m) IS
        //     sx_i and sum(m2) IS sy_j. The old plan's two broadcast-mo
        //     subtrees (each a full scan + explode + agg of embeddings)
        //     and both broadcast joins disappear: 3 scans → 1, 3
        //     exchanges → 1 (plus the final sort). Oracle-identical (the
        //     oracle derives the same moments relationally; the gate
        //     proves group-local sums == global moments on real data).
        val q = transform(col("embedding"),
          x => floor(x.cast("double") * 10000 + 0.5).cast("long"))
        t.embeddings
          .select(q.as("qa"))
          .select(col("qa"), posexplode(col("qa")).as(Seq("i", "m")))
          .select(col("i"), col("m"),
            posexplode(slice(col("qa"), col("i") + 1, size(col("qa")) - col("i")))
              .as(Seq("dj", "m2")))
          .select(col("i"), (col("i") + col("dj")).as("j"),
            col("m"), col("m2"), (col("m") * col("m2")).as("p"))
          .groupBy(col("i"), col("j"))
          .agg(count(lit(1)).as("n_vec"), sum(col("p")).as("sxy"),
            sum(col("m")).as("sx"), sum(col("m2")).as("sy"))
          .select(col("i"), col("j"), col("n_vec"), col("sxy"), col("sx"), col("sy"),
            (col("n_vec") * col("sxy") - col("sx") * col("sy")).as("cov_u"))
          .orderBy(col("i"), col("j"))
      },
      Some("""WITH ex AS (
             |  SELECT vec_id,
             |         CAST(generate_subscripts(embedding, 1) - 1 AS INTEGER) AS i,
             |         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 10000 + 0.5) AS BIGINT) AS m
             |  FROM embeddings
             |), pairs AS (
             |  SELECT a.i AS i, b.i AS j, CAST(COUNT(*) AS BIGINT) AS n_vec,
             |         CAST(SUM(a.m * b.m) AS BIGINT) AS sxy
             |  FROM ex a JOIN ex b ON a.vec_id = b.vec_id AND a.i <= b.i
             |  GROUP BY 1, 2
             |), mo AS (
             |  SELECT i, CAST(SUM(m) AS BIGINT) AS s FROM ex GROUP BY 1
             |)
             |SELECT p.i, p.j, p.n_vec, p.sxy, ma.s AS sx, mb.s AS sy,
             |       p.n_vec * p.sxy - ma.s * mb.s AS cov_u
             |FROM pairs p
             |JOIN mo ma ON p.i = ma.i
             |JOIN mo mb ON p.j = mb.i
             |ORDER BY p.i NULLS FIRST, p.j NULLS FIRST""".stripMargin)),

    // Hybrid retrieval via reciprocal-rank fusion (Similarity.rrfFuse):
    // the production RAG/retrieval pattern — a lexical BM25 list (query
    // terms = the query document's own distinct tokens, the classic
    // more-like-this query) fused with a dense cosine list over the
    // shared doc_id/vec_id space, 1/(60+rank) each side in exact integer
    // micro-units. Candidates surfaced by only one retriever keep their
    // single-side score (full-outer fusion), which is the point of RRF:
    // no score calibration across heterogeneous retrievers, just ranks.
    // Scale shape: the dense side is the brute-force contract (broadcast
    // queries × streamed corpus; IVF/LSH swap in as candidate generators
    // unchanged), the lexical side is inverted-index-bounded
    // (Σ_q Σ_term df(term) candidate rows), and the fusion join carries
    // only |queries|·depth rows. All ranks and fused scores are integers
    // — hash-exact against the DuckDB twin.
    "q_sim_rrf_hybrid" -> Q(
      t => {
        val depth = 20
        val emb = t.embeddings.select(col("vec_id").as("id"),
          Similarity.toDouble(col("embedding")).as("vec"))
        val dense = Similarity.bruteForceTopK(emb.filter(col("id") < 5), emb, k = depth)
          .select(col("qid"), col("cid"), col("rank"))
        val toks = t.documents.select(col("doc_id"),
          TextAnalysis.tokens(col("text")).as("toks"))
        val stats = toks.agg(count(lit(1)).cast("long").as("n_docs"),
          expr("sum(cast(size(toks) as bigint)) div count(1)").as("avgdl"))
        val tf = toks
          .select(col("doc_id"), size(col("toks")).cast("long").as("dl"),
            explode(col("toks")).as("term"))
          .groupBy(col("doc_id"), col("dl"), col("term"))
          .agg(count(lit(1)).as("tf"))
        val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
        val qterms = toks.filter(col("doc_id") < 5)
          .select(col("doc_id").as("qid"),
            explode(array_distinct(col("toks"))).as("term"))
        val scored = qterms.join(tf, Seq("term"))
          .filter(col("doc_id") =!= col("qid"))
          .join(broadcast(dfreq), Seq("term"))
          .crossJoin(broadcast(stats))
          .select(col("qid"), col("doc_id"),
            expr("""((2 * n_docs - 2 * df + 1) * 1000000 div (2 * df + 1))
                    * (44 * tf * avgdl)
                    div (20 * tf * avgdl + 6 * avgdl + 18 * dl)""").as("score_u"))
          .groupBy(col("qid"), col("doc_id")).agg(sum(col("score_u")).as("lex_u"))
        val wl = org.apache.spark.sql.expressions.Window
          .partitionBy(col("qid")).orderBy(col("lex_u").desc, col("doc_id"))
        val lex = scored
          .withColumn("rank", row_number().over(wl).cast("long"))
          .filter(col("rank") <= depth)
          .select(col("qid"), col("doc_id").as("cid"), col("rank"))
        Similarity.rrfFuse(lex, dense, k0 = 60, topK = 10)
          .select(col("qid"), col("rank"), col("cid"),
            col("r_a").as("r_lex"), col("r_b").as("r_dense"), col("rrf_u"))
          .orderBy(col("qid"), col("rank"), col("cid"), col("r_lex"),
            col("r_dense"), col("rrf_u"))
      },
      Some(s"""$duckVecCte, dense0 AS (
               |  SELECT q.vec_id AS qid, c.vec_id AS cid,
               |         row_number() OVER (PARTITION BY q.vec_id
               |           ORDER BY ${duckDot("q.v", "c.v")} / (q.nrm * c.nrm) DESC,
               |                    c.vec_id) AS rn
               |  FROM n q JOIN n c ON q.vec_id < 5 AND q.vec_id <> c.vec_id
               |), dense AS (
               |  SELECT qid, cid, CAST(rn AS BIGINT) AS r_dense
               |  FROM dense0 WHERE rn <= 20
               |), toks AS (
               |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
               |  FROM documents
               |), stats AS (
               |  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
               |         CAST(SUM(CAST(len(toks) AS BIGINT)) AS BIGINT)
               |           // CAST(COUNT(*) AS BIGINT) AS avgdl
               |  FROM toks
               |), tf AS (
               |  SELECT doc_id, dl, term, CAST(COUNT(*) AS BIGINT) AS tf
               |  FROM (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl,
               |               unnest(toks) AS term
               |        FROM toks)
               |  GROUP BY 1, 2, 3
               |), dfr AS (
               |  SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1
               |), qt AS (
               |  SELECT doc_id AS qid, unnest(list_distinct(toks)) AS term
               |  FROM toks WHERE doc_id < 5
               |), sc AS (
               |  SELECT qt.qid, tf.doc_id,
               |         (((2 * n_docs - 2 * df + 1) * 1000000 // (2 * df + 1))
               |          * (44 * tf * avgdl))
               |         // (20 * tf * avgdl + 6 * avgdl + 18 * dl) AS score_u
               |  FROM qt JOIN tf USING (term) JOIN dfr USING (term)
               |  CROSS JOIN stats
               |  WHERE tf.doc_id <> qt.qid
               |), lexs AS (
               |  SELECT qid, doc_id AS cid, CAST(SUM(score_u) AS BIGINT) AS lex_u
               |  FROM sc GROUP BY 1, 2
               |), lex AS (
               |  SELECT qid, cid, CAST(rn AS BIGINT) AS r_lex FROM (
               |    SELECT qid, cid,
               |           row_number() OVER (PARTITION BY qid
               |             ORDER BY lex_u DESC, cid) AS rn
               |    FROM lexs)
               |  WHERE rn <= 20
               |), fused AS (
               |  SELECT COALESCE(l.qid, d.qid) AS qid,
               |         COALESCE(l.cid, d.cid) AS cid,
               |         l.r_lex, d.r_dense,
               |         COALESCE(1000000000 // (60 + l.r_lex), 0)
               |           + COALESCE(1000000000 // (60 + d.r_dense), 0) AS rrf_u
               |  FROM lex l FULL OUTER JOIN dense d
               |    ON l.qid = d.qid AND l.cid = d.cid
               |), ranked AS (
               |  SELECT qid, cid, r_lex, r_dense, rrf_u,
               |         row_number() OVER (PARTITION BY qid
               |           ORDER BY rrf_u DESC, cid) AS rn
               |  FROM fused
               |)
               |SELECT qid, CAST(rn AS BIGINT) AS rank, cid, r_lex, r_dense, rrf_u
               |FROM ranked WHERE rn <= 10
               |ORDER BY qid NULLS FIRST, rank NULLS FIRST, cid NULLS FIRST,
               |         r_lex NULLS FIRST, r_dense NULLS FIRST,
               |         rrf_u NULLS FIRST""".stripMargin)))
}
