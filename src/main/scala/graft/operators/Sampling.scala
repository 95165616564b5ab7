package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling and dataset splitting for training-data pipelines.
  *
  * Every decision derives from `md5(salt ++ ":" ++ id)` — never `rand()`:
  * a rand()-based sample changes under task retry, partition re-planning,
  * or engine version, which silently breaks train/val hygiene (a document
  * can move from val to train between runs). A content-hash rule is
  * reproducible across runs, engines, and cluster layouts, and is exactly
  * replayable in SQL for the oracle.
  *
  * Mechanics: the first 8 hex chars of the md5 are compared LEXICOGRAPHICALLY
  * against a precomputed hex threshold (`hexThreshold(fraction)`). Lowercase
  * hex strings order the same as their numeric values, and both Spark and
  * DuckDB render md5 as lowercase hex, so the comparison is engine-portable
  * without any hex→int parsing. The salt decorrelates independent samples
  * (sampling at 20% then splitting 80/10/10 with a different salt are
  * independent events per document).
  *
  * Scale shape (100 TB): pure map-side projection + filter on codegen'd
  * built-ins (md5/substring/comparison) — no shuffle, no state, trivially
  * parallel, and the filter pushes through column pruning so only the id
  * column is hashed.
  */
object Sampling {

  /** First 8 md5 hex chars of salt:id — the unit-interval draw, as hex. */
  def hashKey(id: Column, salt: String): Column =
    substring(md5(concat(lit(s"$salt:"), id.cast("string")).cast("binary")), 1, 8)

  /** Hex threshold t such that P[hashKey < t] = fraction (up to 2^-32).
    * fraction >= 1 maps to "g", which is lexicographically above every hex
    * string (hex stops at 'f'), i.e. keep-everything. Fractions within
    * 2^-33 of 1 ROUND to 2^32 — which would format as the 9-char
    * "100000000" and lexicographically keep only keys starting with '0' —
    * so any rounded value >= 2^32 also takes the keep-everything branch.
    */
  def hexThreshold(fraction: Double): String = {
    require(fraction >= 0, s"fraction must be >= 0, got $fraction")
    val scaled = math.round(fraction * 4294967296.0)
    if (fraction >= 1.0 || scaled >= 4294967296L) "g"
    else f"$scaled%08x"
  }

  /** The same expression for a DuckDB oracle, for id column `idSql`. */
  def hashKeySql(idSql: String, salt: String): String =
    s"substring(md5('$salt:' || CAST($idSql AS VARCHAR)), 1, 8)"

  /** Deterministic Bernoulli sample: keep ~fraction of rows, decided per-row
    * by content hash of `idCol`.
    */
  def bernoulli(df: DataFrame, idCol: String, fraction: Double,
      salt: String = "sample"): DataFrame =
    df.filter(hashKey(col(idCol), salt) < lit(hexThreshold(fraction)))

  /** Systematic (every-k-th) sampling over a hash-shuffled order, stated
    * scale-safely: the textbook global every-k-th needs ONE totally-ordered
    * pass (a single sorted partition — the classic scale-killer), so the
    * operator instead buckets rows by the draw's first hex nibble (16
    * hash-uniform strata) and strides within each bucket by (draw, id).
    * Each bucket keeps exactly ceil(|bucket|/k) rows — the same 1/k rate
    * with the same stride regularity a survey statistician wants from
    * systematic designs — and the window shuffles on the bucket key only
    * (16-way parallel, each partition sorts its own slice). Deterministic:
    * the draw is a pure content hash, so any engine replays the identical
    * sample ([[hashKeySql]] is the oracle twin). At 100 TB widen the
    * bucket prefix to 2-3 nibbles so per-bucket sorts stay in memory.
    */
  def systematic(df: DataFrame, idCol: String, k: Int,
      salt: String = "sys"): DataFrame = {
    require(k >= 1, s"stride k must be >= 1, got $k")
    // collision-safe internal names (r10 ADVICE: the old draw/bucket/rn
    // silently overwrote same-named input columns and draw/bucket leaked
    // into the output schema); output schema == input schema — callers
    // wanting the draw for display recompute it via [[hashKey]], a pure
    // content hash, exactly as the q_sample_systematic catalog query does
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__sys_bucket")).orderBy(col("__sys_draw"), col(idCol))
    df.withColumn("__sys_draw", hashKey(col(idCol), salt))
      .withColumn("__sys_bucket", substring(col("__sys_draw"), 1, 1))
      .withColumn("__sys_rn", row_number().over(w))
      .filter(pmod(col("__sys_rn") - 1, lit(k)) === 0)
      .drop("__sys_draw", "__sys_bucket", "__sys_rn")
  }

  /** Per-stratum sampling rates (e.g. downsample dominant languages, keep
    * all of rare ones). Strata missing from `fractions` use `default`.
    * The stratum column only selects the RATE; the draw itself still hashes
    * `idCol` alone, so changing a rate never reshuffles which ids are kept
    * in other strata.
    */
  def stratified(df: DataFrame, stratumCol: String, idCol: String,
      fractions: Map[String, Double], default: Double = 0.0,
      salt: String = "sample"): DataFrame = {
    val threshold = fractions.foldLeft(lit(hexThreshold(default))) {
      case (acc, (stratum, f)) =>
        when(col(stratumCol) === stratum, lit(hexThreshold(f))).otherwise(acc)
    }
    df.filter(hashKey(col(idCol), salt) < threshold)
  }

  /** Deterministic weighted (importance) sampling: each row is kept with
    * probability min(1, rate·weight), decided by the content hash of
    * `idCol` — e.g. sample documents proportionally to token count, or
    * examples proportionally to a quality score. The per-row threshold is
    * floor(rate·w·2³²) rendered as 8 lowercase hex chars; `floor` (not
    * round) because IEEE floor is bit-specified while round-half rules
    * differ across engines. rate·w ≥ 1 clamps to keep-always ("g" sorts
    * above all hex); rate·w ≤ 0 keeps nothing. Map-side filter, no
    * shuffle, exactly replayable in SQL ([[weightedSql]]).
    */
  def weighted(df: DataFrame, idCol: String, weightCol: String, rate: Double,
      salt: String = "wsample"): DataFrame = {
    val scaled = floor(lit(rate) * col(weightCol) * lit(4294967296.0))
    val threshold =
      when(scaled >= 4294967296L, lit("g"))
        .when(scaled <= 0L, lit("00000000"))
        .otherwise(lower(lpad(hex(scaled.cast("long")), 8, "0")))
    df.filter(hashKey(col(idCol), salt) < threshold)
  }

  /** The weighted-sampling predicate for a DuckDB oracle. */
  def weightedSql(idSql: String, weightSql: String, rate: Double,
      salt: String = "wsample"): String = {
    val scaled = s"floor($rate * $weightSql * 4294967296.0)"
    s"""${hashKeySql(idSql, salt)} <
       |  CASE WHEN $scaled >= 4294967296 THEN 'g'
       |       WHEN $scaled <= 0 THEN '00000000'
       |       ELSE lower(lpad(hex(CAST($scaled AS BIGINT)), 8, '0')) END""".stripMargin
  }

  /** Domain-mixture resampling — reweight a corpus toward target domain
    * proportions under a global row budget, the composition-control step
    * of a training-data pipeline ("keep 60% of the corpus, oversampling
    * code 3:1 vs web"). Per stratum s with observed count n_s and target
    * weight w_s: acceptance rate_s = min(1, budgetFrac·N·(w_s/W)/n_s)
    * (W = Σw over strata), then each row draws deterministically against
    * rate_s via the [[weighted]] hash predicate (rate 1.0, weight =
    * rate_s).
    *
    * Scale shape: one partial-agg count over the (tiny) stratum domain, a
    * single-row total, rates broadcast back onto the corpus — the corpus
    * itself never shuffles; the filter is map-side like every sampler
    * here, and adding rows never flips an existing row's draw (same
    * stability-under-growth contract as [[bernoulli]]).
    *
    * `weightOf` must be an expression over `stratumCol` (evaluated on the
    * per-stratum relation). The rate arithmetic is a fixed-association
    * DOUBLE expression — every literal is explicitly CAST to DOUBLE so
    * both engines evaluate in IEEE binary64 (without the cast Spark
    * parses the literals as DECIMAL and rounds at scale 15, while DuckDB
    * uses DOUBLE; the divergence could flip a threshold draw) — so a
    * DuckDB oracle spelling the same text gets bit-identical rates.
    */
  def mixtureResample(df: DataFrame, stratumCol: String, idCol: String,
      weightOf: Column, budgetFrac: Double, salt: String = "mixture"): DataFrame = {
    val per = df.groupBy(col(stratumCol)).agg(count(lit(1)).as("__n"))
      .withColumn("__w", weightOf)
    val tot = per.agg(sum(col("__n")).as("__tn"), sum(col("__w")).as("__tw"))
    val rates = per.crossJoin(broadcast(tot))
      .withColumn("__rate",
        expr(s"least(CAST(1.0 AS DOUBLE), CAST($budgetFrac AS DOUBLE) * __tn * __w / (__tw * __n))"))
      .select(col(stratumCol), col("__rate"))
    weighted(df.join(broadcast(rates), stratumCol), idCol, "__rate", 1.0, salt)
      .drop("__rate")
  }

  /** Disjoint, exhaustive split (train/val/test): weights are normalized,
    * each row gets the label of the hash bucket it lands in. Adding rows to
    * the dataset never moves an EXISTING row between splits (stability under
    * dataset growth — the property rand() and row_number() both lack).
    */
  def split(df: DataFrame, idCol: String, weights: Seq[(String, Double)],
      labelCol: String = "split", salt: String = "split"): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0), "weights must be positive")
    val total = weights.map(_._2).sum
    val cum = weights.scanLeft(0.0) { case (acc, (_, w)) => acc + w / total }.tail
    val key = hashKey(col(idCol), salt)
    // last segment is the else-branch: no threshold, immune to rounding
    val label = weights.init.zip(cum.init).reverse.foldLeft(lit(weights.last._1)) {
      case (acc, ((name, _), upper)) =>
        when(key < lit(hexThreshold(upper)), lit(name)).otherwise(acc)
    }
    df.withColumn(labelCol, label)
  }

  /** Deterministic fixed-size sample: exactly `k` rows per stratum (fewer
    * only if the stratum is smaller), chosen as the k smallest hash keys —
    * a reproducible stand-in for reservoir sampling. Unlike a reservoir,
    * membership is stable under reruns and ALMOST stable under growth: a
    * new row displaces at most the current largest-keyed member of its own
    * stratum. Scale shape: one shuffle on the stratum key, then an
    * in-partition window top-k (same shape as any top-k-per-group).
    */
  def exactKPerStratum(df: DataFrame, stratumCol: String, idCol: String,
      k: Int, salt: String = "sample"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol)).orderBy(hashKey(col(idCol), salt), col(idCol))
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .drop("__rk")
  }

  /** Weighted exact-k sample via PRIORITY SAMPLING (Duffield, Lund, Thorup,
    * "Priority sampling for estimation of arbitrary subset sums", JACM 2007
    * — public literature): each row gets priority w/u for a unit draw u and
    * the k highest priorities win, giving inclusion probabilities
    * proportional-ish to weight with strong subset-sum estimation
    * guarantees. Chosen over the Efraimidis–Spirakis u^(1/w) key ON
    * PURPOSE: pow() is not IEEE-correctly-rounded and may differ in the
    * last ulp between engines (the same cross-engine float class the
    * mixture-rate ADVICE fix closed), while this key needs only multiply
    * and divide — BOTH correctly rounded per IEEE-754, so the key is
    * bit-identical on Spark and DuckDB by construction. u is derived
    * integrally from the md5 draw: u = (2h+1)/2^33 over the 8-hex-char
    * h ∈ [0, 2^32), so the key w·2^33/(2h+1) is a quotient of exact
    * integers (< 2^53, exactly representable).
    *
    * Scale shape: key is map-side; the top-k is one global window —
    * Spark 4 plans `row_number ≤ k` with WindowGroupLimit, so each
    * partition forwards at most k candidates (no full sort, no single
    * giant partition materializing the corpus).
    */
  def priorityK(df: DataFrame, idCol: String, weightCol: String,
      k: Int, salt: String = "priority"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val h = conv(hashKey(col(idCol), salt), 16, 10).cast("long")
    val key = col(weightCol).cast("double") * lit(8589934592.0) /
      (h * 2 + 1).cast("double")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(key.desc, col(idCol))
    df.withColumn("priority", key)
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .drop("__rk")
  }

  /** The priority key for a DuckDB oracle (same exact-integer quotient). */
  def priorityKeySql(idSql: String, weightSql: String,
      salt: String = "priority"): String = {
    val h = s"CAST(concat('0x', ${hashKeySql(idSql, salt)}) AS BIGINT)"
    s"CAST($weightSql AS DOUBLE) * 8589934592.0 / CAST($h * 2 + 1 AS DOUBLE)"
  }

  /** Deterministic epoch shuffle: a reproducible pseudo-random total order
    * (hash key asc, id tiebreak). Training wants a different permutation
    * per epoch — pass the epoch in the salt — but the SAME permutation on
    * re-run/retry, which rand() ordering cannot give. Scale shape: ordering
    * by a computed key is a normal Spark range-partitioned sort — and
    * downstream consumers that only need per-shard order can sortWithinPartitions
    * on the same key for a shuffle-free variant.
    */
  def epochShuffle(df: DataFrame, idCol: String, epoch: Int,
      salt: String = "epoch"): DataFrame = {
    val key = hashKey(col(idCol), s"$salt$epoch")
    df.withColumn("shuffle_key", key).orderBy(col("shuffle_key"), col(idCol))
  }

  /** The split's CASE expression for a DuckDB oracle (same thresholds). */
  def splitSql(idSql: String, weights: Seq[(String, Double)],
      salt: String = "split"): String = {
    val total = weights.map(_._2).sum
    val cum = weights.scanLeft(0.0) { case (acc, (_, w)) => acc + w / total }.tail
    val key = hashKeySql(idSql, salt)
    val cases = weights.init.zip(cum.init).map { case ((name, _), upper) =>
      s"WHEN $key < '${hexThreshold(upper)}' THEN '$name'"
    }.mkString(" ")
    s"CASE $cases ELSE '${weights.last._1}' END"
  }
}
