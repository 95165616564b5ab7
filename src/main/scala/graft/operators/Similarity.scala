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

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Coarse quantization bucket: bit i set iff dimension i is non-negative.
    * 2^nbits buckets; deterministic and computable engine-independently.
    */
  def signBucket(v: Column, nbits: Int = 4): Column =
    aggregate(
      sequence(lit(0), lit(nbits - 1)),
      lit(0L),
      (acc, i) => acc + when(element_at(v, i + 1) >= 0, floor(pow(lit(2.0), i)).cast("long")).otherwise(lit(0L)))

  /** Exact brute-force cosine top-k: broadcast the query set, stream the
    * corpus, rank per query. `queries`/`corpus`: (id, vec double[]).
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("id").as("qid"), col("vec").as("qv"))
    val c = corpus.select(col("id").as("cid"), col("vec").as("cv"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("cid"))
    c.crossJoin(broadcast(q))
      .filter(col("qid") =!= col("cid"))
      .withColumn("sim", cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("cid"), col("sim"))
  }

  /** Deterministic ±1 random hyperplane (LCG bits), one per (table, bit). */
  private def hyperplane(planeIdx: Int, dims: Int): Seq[Double] =
    Seq.tabulate(dims) { d =>
      if ((((1103515245L * (planeIdx * dims + d) + 12345L) >> 16) & 1L) == 1L) 1.0 else -1.0
    }

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
    // Statically unrolled: bucket_t = Σ_i 2^i·[v·plane(t,i) ≥ 0]; the plane
    // literals fold into codegen constants.
    def buckets(v: Column): Column =
      array((0 until nTables).map { t =>
        (0 until nbits).map { i =>
          when(dot(v, array(hyperplane(t * nbits + i, dims).map(lit): _*)) >= 0,
            lit(1L << i)).otherwise(lit(0L))
        }.reduce(_ + _)
      }: _*)

    def withBuckets(df: DataFrame, idAs: String, vecAs: String) =
      df.select(col("id").as(idAs), col("vec").as(vecAs),
        posexplode(buckets(col("vec"))).as(Seq("t", "bucket")))

    val q = withBuckets(queries, "qid", "qv")
    val c = withBuckets(corpus, "cid", "cv")
    val candidates = c.join(q, Seq("t", "bucket"))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("qv"), col("cid"), col("cv"))
      .distinct()
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("cid"))
    candidates
      .withColumn("sim", cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("cid"), col("sim"))
  }

  /** Bucketed (IVF-style) top-k: score only same-bucket pairs. Trades exact
    * recall for a shuffle that scales with bucket count — the 100 TB path.
    */
  def bucketedTopK(queries: DataFrame, corpus: DataFrame, k: Int, nbits: Int = 4): DataFrame = {
    val q = queries.select(col("id").as("qid"), col("vec").as("qv"),
      signBucket(col("vec"), nbits).as("bucket"))
    val c = corpus.select(col("id").as("cid"), col("vec").as("cv"),
      signBucket(col("vec"), nbits).as("bucket"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("cid"))
    c.join(q, "bucket")
      .filter(col("qid") =!= col("cid"))
      .withColumn("sim", cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("cid"), col("sim"))
  }
}
