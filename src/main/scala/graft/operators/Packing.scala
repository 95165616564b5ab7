package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Concat-and-chunk sample packing for pretraining: documents are laid
  * end-to-end in a deterministic order and cut into fixed `seqLen`-token
  * chunks; each document's assignment is (shard, chunk index, token offset).
  *
  * Scale shape (100 TB): a single global concatenation order would serialize
  * on one reducer, so documents first shard by `id % nShards` (deterministic,
  * engine-portable — no murmur dependence) and pack WITHIN shards: one
  * shuffle on the shard key, then a per-shard window cumsum. Chunks are
  * globally unique as (shard, chunk); parallelism = nShards, which is sized
  * to the cluster, not the corpus. Assignment is reproducible run-to-run and
  * stable per shard — growing the corpus only appends to each shard's tail.
  */
object Packing {

  /** Assign each doc its pack location: `shard`, `tok_offset` (tokens
    * preceding it in its shard's concatenation), `chunk` = which seqLen
    * window its first token lands in. `docs` needs `idCol` (integral) and
    * `tokenCountCol`. Sharding uses `pmod`, not `%`: Spark's `%` preserves
    * the dividend's sign, so a negative id would silently land outside
    * [0, nShards); pmod keeps every id in range (and matches the oracle
    * formulation, which is only exercised on non-negative ids).
    */
  def packChunks(docs: DataFrame, idCol: String, tokenCountCol: String,
      seqLen: Int, nShards: Int = 8): DataFrame = {
    require(seqLen > 0 && nShards > 0, "seqLen and nShards must be positive")
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .withColumn("shard", pmod(col(idCol), lit(nShards)).cast("long"))
      .withColumn("tok_offset",
        coalesce(sum(col(tokenCountCol).cast("long")).over(w), lit(0L)))
      // integer div, not floor(double /): tok_offset is a token cumsum that
      // can pass 2^53 on a petatoken-scale shard, where double division
      // silently rounds to the wrong chunk; div is exact at any magnitude
      // (both are non-negative here, so div == floor-division)
      .withColumn("chunk", expr(s"tok_offset div $seqLen"))
  }
}
