package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity search (SURVEY.md §2C LLM-pipeline row), built from
  * higher-order functions — no UDFs, so the dot-product fold is codegen'd.
  *
  * Scale design (100 TB): brute-force top-k is the exact baseline — it
  * broadcasts the (small) query set and streams the corpus, so it scales in
  * corpus size but not query count. The production path is the bucketed
  * (IVF-style) variant: corpus and queries are partitioned by a coarse
  * quantization key (sign bits of leading dimensions here; k-means cells in
  * a real system) and only same-bucket pairs are scored — the all-pairs
  * product never materializes, and the shuffle key space grows with the
  * bucket count.
  *
  * Numeric contract: all arithmetic is float→double cast then a
  * left-to-right fold, bit-reproducible in DuckDB via list_reduce — the
  * oracle checks exact signature equality, not just "close".
  */
object Similarity {

  /** float[] → double[] (cast before any arithmetic, both engines). */
  def toDouble(v: Column): Column = transform(v, _.cast("double"))

  /** Left-to-right fold of elementwise products. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Composed-HOF cosine — the REFERENCE semantics the DuckDB oracles are
    * written against (three left-to-right folds: dot + both norms). Kept
    * as the reference form and for the VectorKernelSpec parity fence;
    * [[cosine]] routes to the bit-identical fused kernel (AbBench r11-2:
    * 69× on the 2000×2000 pair grid — HOF lambda trees re-interpret per
    * element, the kernel is one primitive loop in codegen).
    */
  def cosineComposed(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  def cosine(a: Column, b: Column): Column = cosineNative(a, b)

  /** Coarse quantization bucket: bit i set iff dimension i is non-negative.
    * 2^nbits buckets; deterministic and computable engine-independently.
    */
  def signBucket(v: Column, nbits: Int = 4): Column =
    aggregate(
      sequence(lit(0), lit(nbits - 1)),
      lit(0L),
      (acc, i) => acc + when(element_at(v, i + 1) >= 0, floor(pow(lit(2.0), i)).cast("long")).otherwise(lit(0L)))

  /** Symmetric int8 scalar quantization: q[i] = round-half-up of
    * x[i]·127/max|x|, in [-127, 127]; the zero vector quantizes to zeros.
    * At 100 TB this is the memory lever that makes ANN feasible: an int8
    * corpus is 4× smaller than float32 (8× vs the double working form), so
    * 4× more vectors fit per executor and the scan reads 4× less. Scoring
    * in the integer domain is also divergence-free: an int64 dot of int8
    * values is exact, so quantized rankings are bit-stable across engines
    * — unlike float dots, which need a fixed fold order.
    * floor(x+0.5) rather than engine round(): both engines' IEEE ops give
    * identical doubles, so the quantized codes match bit-for-bit.
    */
  def maxAbs(vec: Column): Column = array_max(transform(vec, x => abs(x)))

  /** Quantize against a PRE-MATERIALIZED max|x| column: a HOF lambda
    * re-evaluates embedded expressions per element, so inlining the
    * array_max here would be O(d²) per vector (the repo-wide HOF lesson).
    */
  def quantize(vec: Column, maxabs: Column): Column =
    transform(vec, x =>
      when(maxabs === 0.0, lit(0L))
        .otherwise(floor(x * 127.0 / maxabs + 0.5).cast("long")))

  /** Composed-HOF int64 dot — reference semantics for the parity fence;
    * [[intDot]] routes to the bit-identical fused kernel (AbBench r11-2:
    * 25× on the pair grid).
    */
  def intDotComposed(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)

  /** Exact int64 dot of two quantized vectors (fused native kernel). */
  def intDot(a: Column, b: Column): Column =
    graft.functions.DotProductLongExpression.column(a, b)

  /** Quantized brute-force top-k: ranks by the COSINE OF THE QUANTIZED
    * vectors — cross dot and both self-dots are exact int64 arithmetic, so
    * the per-vector max-abs scale cancels and only int8 rounding noise
    * separates this from the float ranking (ranking by the raw integer dot
    * instead would entangle each candidate's L∞/L2 norm ratio and wreck
    * recall). The floats (two sqrt, one multiply, one divide over exact
    * integers) are IEEE-deterministic, so the ranking is engine-portable.
    * Same broadcast-queries/stream-corpus shape as [[bruteForceTopK]], at
    * 4× less corpus memory traffic.
    */
  def quantizedTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.withColumn("__ma", maxAbs(col("vec")))
      .select(col("id").as("qid"), quantize(col("vec"), col("__ma")).as("qq"))
      .withColumn("qaa", intDot(col("qq"), col("qq")))
    val c = corpus.withColumn("__ma", maxAbs(col("vec")))
      .select(col("id").as("cid"), quantize(col("vec"), col("__ma")).as("cq"))
      .withColumn("caa", intDot(col("cq"), col("cq")))
    val w = Window.partitionBy(col("qid")).orderBy(col("qcos").desc, col("cid"))
    c.crossJoin(broadcast(q))
      .filter(col("qid") =!= col("cid"))
      .withColumn("qdot", intDot(col("qq"), col("cq")))
      .withColumn("qcos",
        col("qdot").cast("double") / (sqrt(col("qaa")) * sqrt(col("caa"))))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("cid"), col("qdot"), col("qcos"))
  }

  /** Hard-negative mining (the dense-retrieval training-data primitive,
    * e.g. DPR/ANCE): for each query vector, the top-k most-similar corpus
    * vectors whose LABEL DIFFERS — the near-miss impostors a contrastive
    * loss needs. Same quantized-cosine contract as [[quantizedTopK]] (exact
    * int64 dots of int8 codes → IEEE-deterministic cosine, so the ranking
    * is engine-portable), same broadcast-queries/stream-corpus scale shape;
    * the only change is the join predicate: label inequality instead of id
    * inequality, evaluated before the dot so same-class candidates are
    * skipped without scoring. `queries`/`corpus`: (id, vec double[], label).
    */
  def hardNegatives(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.withColumn("__ma", maxAbs(col("vec")))
      .select(col("id").as("qid"), col("label").as("qlabel"),
        quantize(col("vec"), col("__ma")).as("qq"))
      .withColumn("qaa", intDot(col("qq"), col("qq")))
    val c = corpus.withColumn("__ma", maxAbs(col("vec")))
      .select(col("id").as("cid"), col("label").as("clabel"),
        quantize(col("vec"), col("__ma")).as("cq"))
      .withColumn("caa", intDot(col("cq"), col("cq")))
    val w = Window.partitionBy(col("qid")).orderBy(col("qcos").desc, col("cid"))
    c.crossJoin(broadcast(q))
      .filter(col("qlabel") =!= col("clabel"))
      .withColumn("qdot", intDot(col("qq"), col("cq")))
      .withColumn("qcos",
        col("qdot").cast("double") / (sqrt(col("qaa")) * sqrt(col("caa"))))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("cid"), col("clabel"),
        col("qdot"), col("qcos"))
  }

  /** Fused native-kernel cosine — bit-identical to [[cosine]] (same
    * left-to-right IEEE accumulation; VectorKernelSpec proves pairwise
    * equality), but one generated loop per pair instead of three HOF folds.
    */
  def cosineNative(a: Column, b: Column): Column =
    graft.functions.CosineSimilarityExpression.column(a, b)

  /** Exact brute-force cosine top-k: broadcast the query set, stream the
    * corpus, rank per query. `queries`/`corpus`: (id, vec double[]).
    * Scores with the fused kernel; [[bruteForceTopKComposed]] is the
    * reference-form twin (bit-identical rows, three HOF folds per pair).
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame =
    bruteForce(queries, corpus, k, cosineNative)

  /** Composed-HOF twin of [[bruteForceTopK]] — the documented reference
    * baseline the oracle SQL mirrors; kept in the catalog for the A/B.
    */
  def bruteForceTopKComposed(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame =
    bruteForce(queries, corpus, k, cosineComposed)

  /** Reciprocal-rank fusion of two per-query ranked candidate lists —
    * the standard way hybrid retrieval combines a lexical (BM25) and a
    * dense (embedding) ranking without score calibration: each list
    * contributes 1/(k0+rank) and the fused order is by the sum. Inputs
    * are (qid, cid, rank) with rank 1-based within qid; a candidate
    * present in only one list gets zero contribution from the other
    * (full-outer union of the lists, the convention that keeps single-
    * list outliers retrievable). The contribution is computed as
    * integer micro-units — `1e9 div (k0 + rank)` — so fused scores are
    * exact BIGINTs on any engine; with k0=60 and depth ≤ 1e3 the two
    * reciprocals stay well under 2^31, far from overflow.
    *
    * Scale shape: both inputs are already depth-bounded per query (top-N
    * lists), so this join carries |queries|·depth rows — negligible next
    * to the retrieval stages that produced the lists; the shuffle key is
    * (qid, cid) and the window sorts depth·2 rows per query at most.
    */
  def rrfFuse(a: DataFrame, b: DataFrame, k0: Int, topK: Int): DataFrame = {
    val l = a.select(col("qid"), col("cid"), col("rank").cast("long").as("r_a"))
    val r = b.select(col("qid"), col("cid"), col("rank").cast("long").as("r_b"))
    val w = Window.partitionBy(col("qid")).orderBy(col("rrf_u").desc, col("cid"))
    l.join(r, Seq("qid", "cid"), "full_outer")
      .withColumn("rrf_u",
        coalesce(expr(s"1000000000 div ($k0 + r_a)"), lit(0L)) +
          coalesce(expr(s"1000000000 div ($k0 + r_b)"), lit(0L)))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
      .select(col("qid"), col("rank"), col("cid"), col("r_a"), col("r_b"),
        col("rrf_u"))
  }

  private def bruteForce(queries: DataFrame, corpus: DataFrame, k: Int,
      sim: (Column, Column) => Column): DataFrame = {
    val q = queries.select(col("id").as("qid"), col("vec").as("qv"))
    val c = corpus.select(col("id").as("cid"), col("vec").as("cv"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("cid"))
    c.crossJoin(broadcast(q))
      .filter(col("qid") =!= col("cid"))
      .withColumn("sim", sim(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("cid"), col("sim"))
  }

  /** Deterministic ±1 random hyperplane, one per (table, bit). Bits come
    * from a splitmix64 avalanche of the flat plane/dim index — NOT an LCG:
    * a single LCG step leaves consecutive seed blocks correlated, which
    * correlates consecutive PLANES, and correlated planes collapse the
    * effective number of independent LSH tables (measured: 5 of 64
    * qualifying pairs missed at nbits=2 × 16 tables where independent
    * theory predicts 0.02). splitmix64's full-avalanche finalizer makes
    * plane bits pairwise-independent for adjacent indexes.
    */
  private def hyperplane(planeIdx: Int, dims: Int): Seq[Double] =
    Seq.tabulate(dims) { d =>
      var z = planeIdx.toLong * dims + d + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^= z >>> 31
      if ((z & 1L) == 1L) 1.0 else -1.0
    }

  /** One nbits-bit bucket key per LSH table: bucket_t = Σ_i 2^i·[v·plane(t,i) ≥ 0].
    * Statically unrolled — the plane literals fold into codegen constants.
    */
  private def tableBuckets(v: Column, dims: Int, nbits: Int, nTables: Int): Column =
    array((0 until nTables).map { t =>
      (0 until nbits).map { i =>
        when(dot(v, array(hyperplane(t * nbits + i, dims).map(lit): _*)) >= 0,
          lit(1L << i)).otherwise(lit(0L))
      }.reduce(_ + _)
    }: _*)

  /** Multi-table random-hyperplane LSH top-k — the production ANN path.
    *
    * Single-table sign bucketing has recall (1-θ/π)^k per neighbor; with
    * random embeddings at cos≈0.4 that is ~16% — unusable alone. L tables
    * union their candidate sets: recall 1-(1-p^k)^L (~75% at L=8, k=4),
    * tunable per corpus. Cost stays shuffle-shaped: explode each vector to L
    * (table, bucket) rows, join per table, dedup candidate pairs, score only
    * candidates. At 100 TB the candidate set per query is a tiny corpus
    * fraction (bucket fan-out grows with k), and the join key space
    * (table × bucket) spreads the shuffle.
    */
  def lshTopK(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      dims: Int,
      nbits: Int = 4,
      nTables: Int = 8): DataFrame = {
    def withBuckets(df: DataFrame, idAs: String, vecAs: String) =
      df.select(col("id").as(idAs), col("vec").as(vecAs),
        posexplode(tableBuckets(col("vec"), dims, nbits, nTables)).as(Seq("t", "bucket")))

    val q = withBuckets(queries, "qid", "qv")
    val c = withBuckets(corpus, "cid", "cv")
    val candidates = c.join(q, Seq("t", "bucket"))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("qv"), col("cid"), col("cv"))
      .distinct()
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("cid"))
    candidates
      .withColumn("sim", cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("cid"), col("sim"))
  }

  /** Scale-safe embedding near-duplicate pairs: multi-table LSH candidate
    * generation + exact cosine verification — the 100 TB replacement for
    * the all-pairs `a < b` self-join (quadratic in corpus size; kept in
    * baseline_sim_near_dup only as the exact oracle baseline).
    *
    * Shape: explode each vector to L (table, bucket) keys, self-join per
    * key (a < b halves the pair space), dedup candidate ID PAIRS while
    * they are still narrow (two longs — the vectors are joined back
    * after dedup, so wide rows never enter the distinct shuffle), then
    * verify each candidate with the exact cosine and keep sim ≥ threshold.
    * Recall is 1-(1-p^nbits)^nTables per qualifying pair
    * (p = 1-θ/π); nbits=2/nTables=20 gives ≥0.9999 at cos 0.4 — verified
    * equal to the all-pairs result on the testdata (SimilaritySpec +
    * q_sim_near_dup_lsh's all-pairs oracle). Larger corpora raise nbits
    * (bucket count) to keep per-bucket candidate counts bounded; the
    * shuffle key space (table × bucket) grows with it.
    *
    * `emb`: (vec_id long, v double[]).
    */
  def lshNearDupPairs(
      emb: DataFrame,
      threshold: Double,
      dims: Int,
      nbits: Int = 2,
      nTables: Int = 20): DataFrame = {
    val keyed = emb.select(col("vec_id"),
      posexplode(tableBuckets(col("v"), dims, nbits, nTables)).as(Seq("t", "bucket")))
    val candidates = keyed.select(col("t"), col("bucket"), col("vec_id").as("a"))
      .join(keyed.select(col("t"), col("bucket"), col("vec_id").as("b")), Seq("t", "bucket"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"))
      .distinct()
    candidates
      .join(emb.select(col("vec_id").as("a"), col("v").as("va")), Seq("a"))
      .join(emb.select(col("vec_id").as("b"), col("v").as("vb")), Seq("b"))
      .withColumn("sim", cosine(col("va"), col("vb")))
      .filter(col("sim") >= threshold)
      .select(col("a"), col("b"), col("sim"))
  }

  /** Bucketed (IVF-style) top-k: score only same-bucket pairs. Trades exact
    * recall for a shuffle that scales with bucket count — the 100 TB path.
    */
  /** Quantized vectors with their exact int64 self-dot: `(id, q, aa)`.
    * Eagerly checkpointed — the k-means loop and any downstream consumer
    * (semantic dedup) reuse it across several plan branches/iterations,
    * and eager avoids the lazy-checkpoint orphaned-backfill-job noise
    * documented on Dedup.lshNearDupPairs.
    */
  def prepareQuantized(vectors: DataFrame): DataFrame =
    vectors.withColumn("__ma", maxAbs(col("vec")))
      .select(col("id"), quantize(col("vec"), col("__ma")).as("q"))
      .withColumn("aa", intDot(col("q"), col("q")))
      .localCheckpoint(true)

  /** Spherical k-means over int8-quantized vectors — the clustering that
    * underlies semantic dedup and IVF cell assignment at corpus scale.
    *
    * Scale shape (the canonical distributed Lloyd's): centroids are k·d
    * scalars — CONSTANT in corpus size — so they live on the driver and
    * ship to executors as a broadcast literal; assignment is a pure
    * map-side fold over the k centroids (no shuffle, no join); the update
    * step is one partial-agg shuffle of at most k·d·partitions rows
    * (posexplode → groupBy(cluster, dim) → sum) whose k·d result is
    * collected back. Nothing driver-side grows with the data.
    *
    * Numeric contract (what makes the DuckDB oracle exact): centroids are
    * per-dimension int64 SUMS of member codes, never float averages —
    * integer addition is order-independent, so the update is identical
    * under any partitioning; cosine scoring against a sum-vector equals
    * scoring against the mean direction (scale cancels), and the score
    * `intDot / sqrt(int64)` is one IEEE-exact division+sqrt over exact
    * integers. Assignment keeps the LOWEST cluster index on ties (strict
    * `>` in the fold ≡ the oracle's ORDER BY score DESC, cl ASC).
    * Deterministic init: the k lowest-id vectors, cluster index = id rank.
    * An emptied cluster keeps its previous centroid.
    *
    * `qn`: prepared quantized vectors from [[prepareQuantized]] →
    * returns (id, cluster int).
    */
  /** Cluster count for same-cluster blocking: `max(k0, ceil(n /
    * targetBlockSize))`. Blocking only bounds the candidate-pair space if
    * the number of blocks grows with the corpus: with k FIXED the expected
    * block is n/k and Σ|block|² ≈ n²/k — still quadratic in n. Scaling k
    * with n pins the expected block size at `targetBlockSize`, so the
    * blocked pair space Σ|block|² ≲ n·targetBlockSize grows linearly
    * (modulo cluster skew). Driver-side centroid state is k·d scalars =
    * (n/targetBlockSize)·d — ~2 GB per billion 1k-dim float vectors at the
    * default block size, within driver heap at 100 TB corpus scale, and
    * the per-iteration update shuffle stays k·d·partitions rows.
    */
  def blockCount(n: Long, k0: Int = 8, targetBlockSize: Long = 4096L): Int = {
    require(k0 > 0 && targetBlockSize > 0,
      s"k0 and targetBlockSize must be positive, got $k0 / $targetBlockSize")
    math.max(k0.toLong, (n + targetBlockSize - 1) / targetBlockSize)
      .min(Int.MaxValue.toLong).toInt
  }

  def kmeansAssign(qn: DataFrame, k: Int, iters: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    var cents: Array[Array[Long]] = qn.orderBy(col("id")).limit(k)
      .select(col("q")).collect().map(_.getSeq[Long](0).toArray)
    // Clamp the cluster count to the seed vectors actually collected: with
    // fewer than k inputs the surplus clusters could never become non-empty,
    // and indexing the centroid literal past its length errors under ANSI
    // mode (and cents(j) would throw in the empty-cluster branch).
    val kk = math.min(k, cents.length)
    if (kk == 0) // empty input: keep the (id, cluster) schema, zero rows
      return qn.select(col("id"), lit(-1).cast("int").as("cluster"))
    def assignCol(cents: Array[Array[Long]]): Column = {
      val centLit = typedLit(cents.map(_.toSeq).toSeq)
      val caaLit = typedLit(cents.map(c => c.map(x => x * x).sum).toSeq)
      aggregate(
        sequence(lit(0), lit(kk - 1)),
        struct(lit(Double.NegativeInfinity).as("s"), lit(-1).as("j")),
        (acc, j) => {
          val score = intDot(col("q"), element_at(centLit, j + 1)).cast("double") /
            sqrt(element_at(caaLit, j + 1).cast("double"))
          when(score > acc.getField("s"),
            struct(score.as("s"), j.cast("int").as("j"))).otherwise(acc)
        }).getField("j")
    }
    val d = cents.headOption.map(_.length).getOrElse(0)
    for (_ <- 1 to iters) {
      val sums = qn.withColumn("cluster", assignCol(cents))
        .select(col("cluster"), posexplode(col("q")).as(Seq("pos", "v")))
        .groupBy(col("cluster"), col("pos")).agg(sum(col("v")).as("s"))
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
      val byCluster = sums.groupBy(_._1)
      cents = Array.tabulate(kk) { j =>
        byCluster.get(j) match {
          case Some(rows) =>
            val a = new Array[Long](d); rows.foreach { case (_, p, s) => a(p) = s }; a
          case None => cents(j)
        }
      }
    }
    qn.withColumn("cluster", assignCol(cents)).select(col("id"), col("cluster"))
  }

  def bucketedTopK(queries: DataFrame, corpus: DataFrame, k: Int, nbits: Int = 4): DataFrame = {
    val q = queries.select(col("id").as("qid"), col("vec").as("qv"),
      signBucket(col("vec"), nbits).as("bucket"))
    val c = corpus.select(col("id").as("cid"), col("vec").as("cv"),
      signBucket(col("vec"), nbits).as("bucket"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("cid"))
    c.join(q, "bucket")
      .filter(col("qid") =!= col("cid"))
      .withColumn("sim", cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("cid"), col("sim"))
  }

  /** Product-quantization codes (Jégou, Douze & Schmid, TPAMI 2011 — the
    * FAISS-style memory-bound ANN structure): the int8 vector is split
    * into `m` subvectors of `subDim` dims, and EACH SUBSPACE is clustered
    * independently with the same exact-integer spherical k-means as
    * [[kmeansAssign]] (within one subspace, cosine against an int64
    * SUM-centroid equals cosine against the mean — scale cancels — so the
    * per-subspace assignment is exact, deterministic, and oracle-
    * replayable as-is). A vector's PQ code is its m cluster ids: m·log₂k
    * bits instead of d floats — at 100 TB the corpus side of a search
    * touches ONLY these codes (m longs here; m bytes packed), which is
    * the entire point of PQ.
    *
    * Returns (id, m, code) in long form — one row per (vector, subspace),
    * the shape the ADC scoring join consumes directly.
    */
  def pqCodes(qn: DataFrame, m: Int, subDim: Int, k: Int, iters: Int): DataFrame =
    (0 until m).map { i =>
      val sub = qn.select(col("id"),
        slice(col("q"), i * subDim + 1, subDim).as("q"))
      kmeansAssign(sub, k, iters)
        .select(col("id"), lit(i).cast("int").as("m"),
          col("cluster").cast("int").as("code"))
    }.reduce(_ unionByName _)

  /** Per-(subspace, code) codebook centroids as exact MICRO-UNIT means:
    * floor(sum·10⁶ / count) per dimension — a fixed sequence of exactly-
    * representable IEEE ops over exact int64 sums (|sum·10⁶| < 2⁵³), so
    * both engines floor identically (a `div`/`//` integer division would
    * NOT be portable here: negative sums truncate on Spark but floor on
    * DuckDB). Means, not sums: the ADC score mixes subspaces, and a
    * sum-centroid would weight each term by its cluster's member count.
    */
  /** Maximal-marginal-relevance rerank (Carbonell & Goldstein, SIGIR 1998):
    * greedily select `selectK` results per query maximizing
    * `λ·rel(q,c) − (1−λ)·max_{s∈selected} sim(c,s)` — relevance traded
    * against redundancy, the standard diversity rerank between retrieval
    * and a context window.
    *
    * Scale shape: stage 1 is the quantized brute-force pass (broadcast
    * queries, stream the corpus — the only corpus-sized work); everything
    * after runs on the per-query SHORTLIST (nq·shortlistK rows) — the
    * pairwise sim matrix is nq·K², and the greedy loop is `selectK`
    * driver-coordinated rounds over shortlist-sized frames, each
    * checkpointed so plans stay flat. The corpus is touched exactly once
    * regardless of selectK.
    *
    * Numeric contract: rel and sim are the quantized-cosine of
    * [[quantizedTopK]] (exact int64 dots, then a fixed IEEE op sequence);
    * the MMR combination uses double literals CAST on both engines, ties
    * break on cid — deterministic, oracle-exact.
    */
  def mmrRerank(queries: DataFrame, corpus: DataFrame,
                shortlistK: Int, selectK: Int): DataFrame = {
    val q = queries.withColumn("__ma", maxAbs(col("vec")))
      .select(col("id").as("qid"), quantize(col("vec"), col("__ma")).as("qq"))
      .withColumn("qaa", intDot(col("qq"), col("qq")))
    val c = corpus.withColumn("__ma", maxAbs(col("vec")))
      .select(col("id").as("cid"), quantize(col("vec"), col("__ma")).as("cq"))
      .withColumn("caa", intDot(col("cq"), col("cq")))
    val wRel = Window.partitionBy(col("qid")).orderBy(col("rel").desc, col("cid"))
    val shortlist = c.crossJoin(broadcast(q))
      .filter(col("qid") =!= col("cid"))
      .withColumn("rel",
        intDot(col("qq"), col("cq")).cast("double") /
          (sqrt(col("qaa")) * sqrt(col("caa"))))
      .withColumn("rn", row_number().over(wRel))
      .filter(col("rn") <= shortlistK)
      .select(col("qid"), col("cid"), col("rel"), col("cq"), col("caa"))
      .localCheckpoint(true)
    val pa = shortlist.select(col("qid"), col("cid").as("a"),
      col("cq").as("aq"), col("caa").as("aaa"))
    val pb = shortlist.select(col("qid"), col("cid").as("b"),
      col("cq").as("bq"), col("caa").as("baa"))
    val pairSims = pa.join(pb, Seq("qid")).filter(col("a") =!= col("b"))
      .select(col("qid"), col("a"), col("b"),
        (intDot(col("aq"), col("bq")).cast("double") /
          (sqrt(col("aaa")) * sqrt(col("baa")))).as("sim"))
      .localCheckpoint(true)
    val slim = shortlist.select(col("qid"), col("cid"), col("rel"))
    val wPick = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("cid"))
    var selected = slim
      .withColumn("score", lit(0.7) * col("rel"))
      .withColumn("rn", row_number().over(wPick)).filter(col("rn") === 1)
      .select(col("qid"), col("cid"), lit(1L).as("step"), col("score"))
      .localCheckpoint(true)
    for (s <- 2 to selectK) {
      val ms = pairSims
        .join(selected.select(col("qid"), col("cid").as("b")), Seq("qid", "b"))
        .groupBy(col("qid"), col("a").as("cid"))
        .agg(max(col("sim")).as("maxsim"))
      val pick = slim
        .join(selected.select(col("qid"), col("cid")), Seq("qid", "cid"), "left_anti")
        .join(ms, Seq("qid", "cid"))
        .withColumn("score", lit(0.7) * col("rel") - lit(0.3) * col("maxsim"))
        .withColumn("rn", row_number().over(wPick)).filter(col("rn") === 1)
        .select(col("qid"), col("cid"), lit(s.toLong).as("step"), col("score"))
      selected = selected.unionByName(pick).localCheckpoint(true)
    }
    selected
  }

  def pqCodebook(qn: DataFrame, codes: DataFrame, m: Int, subDim: Int): DataFrame = {
    val subs = (0 until m).map { i =>
      qn.select(col("id"), lit(i).cast("int").as("m"),
        slice(col("q"), i * subDim + 1, subDim).as("qs"))
    }.reduce(_ unionByName _)
    subs.join(codes, Seq("id", "m"))
      .select(col("m"), col("code"), posexplode(col("qs")).as(Seq("pos", "v")))
      .groupBy(col("m"), col("code"), col("pos"))
      .agg(sum(col("v")).as("s"), count(lit(1)).as("cnt"))
      .groupBy(col("m"), col("code"))
      .agg(array_sort(collect_list(struct(col("pos"),
        floor(col("s") * 1000000 / col("cnt")).as("cv")))).as("pcs"))
      .select(col("m"), col("code"), transform(col("pcs"), _.getField("cv")).as("cv"))
  }
}
