package graft.operators

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** KMV (k-minimum-values, "bottom-k") distinct-value sketch — the set-
  * operation member of the sketch family next to HLL (cardinality,
  * `q_agg_hll_merge`) and Count-Min (frequency, `q_agg_cms_heavy_hitters`):
  * a KMV sketch supports UNION **and INTERSECTION** estimates, which HLL
  * cannot (HLL unions exactly but has no intersection operator — the usual
  * inclusion-exclusion workaround explodes its error on small overlaps).
  *
  * The sketch of a column is the k smallest DISTINCT `xxhash64` values of
  * its rows, compared as UNSIGNED 64-bit integers and kept sorted. Three
  * properties make it the right 100 TB shape:
  *
  *  - **Deterministic**: xxhash64 is a fixed function and "k smallest of a
  *    set" is order-independent, so the sketch is bit-identical across
  *    partitionings, retries, and runs — unlike a sampled summary. The
  *    rows-only gate output is therefore stable run to run.
  *  - **Exactly mergeable**: sketch(A ∪ B) == bottomK(sketch(A) ∪ sketch(B))
  *    as arrays, an associative + commutative merge (KmvSpec pins array
  *    equality, not estimate closeness). Per-partition partial aggregation
  *    ships k longs per group per partition.
  *  - **Cheap when warm**: once a group's buffer is full, a new hash is
  *    rejected O(1) unless it beats the current k-th minimum — expected
  *    O(k/n) insertion rate, so the per-row cost converges to one unsigned
  *    compare.
  *
  * Estimators (Beyer et al., SIGMOD'07): with u_k = the k-th smallest hash
  * normalized to (0,1], D̂ = (k-1)/u_k; below capacity the sketch IS the
  * distinct set and the estimate is exact. Intersection via the union
  * sketch K = bottomK(A ∪ B): ρ = |K ∩ A ∩ B| / |K|, |A∩B| ≈ ρ · D̂(A∪B).
  */
object KmvSketch {

  private val unsignedLt: (Long, Long) => Boolean =
    (a, b) => java.lang.Long.compareUnsigned(a, b) < 0

  /** k smallest distinct hashes of the concatenation, sorted unsigned.
    * Returns an IndexedSeq: the aggregator's per-row fast path reads
    * `.length` and `.last`, which MUST be O(1) — a List-backed Seq here
    * silently turns the reject path into O(k) per row. Measured (AbBench
    * r11-4a, 20M rows / 5M distinct / 8 groups): ~2.1 s List-backed →
    * 1.14 s as Vector, wall-parity with exact countDistinct (1.15 s) at
    * local[32]; the cluster win is shuffle volume — ≤ k longs per
    * (group, partition) vs every distinct (group, value) pair.
    */
  def bottomK(k: Int, xs: Seq[Long]): IndexedSeq[Long] =
    xs.distinct.sortWith(unsignedLt).take(k).toVector

  /** Unsigned hash → (0, 1] fraction of the 2^64 hash space, computed as
    * (unsigned(h) + 1) / 2^64 via a high/low split (no BigInt). The +1
    * keeps the smallest possible hash (0) at a positive fraction.
    */
  private def frac(h: Long): Double =
    ((h >>> 11).toDouble * 2048.0 + (h & 2047).toDouble + 1.0) / math.pow(2.0, 64)

  /** Distinct-count estimate. Exact (= sketch size) while below capacity;
    * (k-1)/u_k once the sketch is full.
    */
  def estimateDistinct(k: Int, sketch: Seq[Long]): Long =
    if (sketch.size < k) sketch.size.toLong
    else math.rint((k - 1).toDouble / frac(sketch.last)).toLong

  /** Union sketch — the exact merge (associative, commutative). */
  def union(k: Int, a: Seq[Long], b: Seq[Long]): Seq[Long] =
    bottomK(k, a ++ b)

  /** Intersection estimate from two same-k sketches: Jaccard-style ratio of
    * shared members inside the union sketch, scaled by the union estimate.
    */
  def estimateIntersection(k: Int, a: Seq[Long], b: Seq[Long]): Long = {
    val u = union(k, a, b)
    if (u.isEmpty) 0L
    else {
      val sa = a.toSet
      val sb = b.toSet
      val rho = u.count(h => sa.contains(h) && sb.contains(h)).toDouble / u.size
      math.rint(rho * estimateDistinct(k, u)).toLong
    }
  }
}

/** Typed UDAF building a KMV sketch of pre-hashed (`xxhash64`) inputs.
  * Buffer = the sorted bottom-k array itself; reduce rejects O(1) once the
  * buffer is full and the hash is above the current k-th minimum.
  */
class KmvAggregator(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {

  override def zero: Seq[Long] = Seq.empty

  override def reduce(b: Seq[Long], h: Long): Seq[Long] =
    if (b.length >= k && java.lang.Long.compareUnsigned(h, b.last) >= 0) b
    else KmvSketch.bottomK(k, b :+ h)

  override def merge(b1: Seq[Long], b2: Seq[Long]): Seq[Long] =
    KmvSketch.bottomK(k, b1 ++ b2)

  override def finish(r: Seq[Long]): Seq[Long] = r

  override def bufferEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] = bufferEncoder
}
