package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unit contract for the quantized spherical k-means operator: geometric
  * sanity on separable directions, tie determinism, empty-cluster
  * handling, and the map-side (shuffle-free) assignment plan shape.
  */
class KmeansSpec extends SparkSpec {
  import spark.implicits._

  private def prep(rows: Seq[(Long, Seq[Double])]) =
    Similarity.prepareQuantized(
      rows.toDF("id", "vec").select(col("id"), col("vec")))

  test("separable directions cluster together and centroids are member sums") {
    // two clean directions in 4-d: +x-ish (ids 0,2,3) and +y-ish (ids 1,4,5)
    val qn = prep(Seq(
      0L -> Seq(1.0, 0.1, 0.0, 0.0), 1L -> Seq(0.1, 1.0, 0.0, 0.0),
      2L -> Seq(0.9, 0.2, 0.0, 0.0), 3L -> Seq(1.0, 0.0, 0.1, 0.0),
      4L -> Seq(0.0, 0.9, 0.1, 0.0), 5L -> Seq(0.2, 1.0, 0.0, 0.1)))
    val got = Similarity.kmeansAssign(qn, k = 2, iters = 2)
      .as[(Long, Int)].collect().toMap
    assert(got.keySet == Set(0L, 1L, 2L, 3L, 4L, 5L))
    assert(got(0L) == 0 && got(2L) == 0 && got(3L) == 0)
    assert(got(1L) == 1 && got(4L) == 1 && got(5L) == 1)
  }

  test("duplicate init centroids: ties go to the lowest cluster, empties keep centroids") {
    // ids 0 and 1 are identical, so init centroids 0 and 1 coincide and
    // every first-round score ties — the tie rule must send ALL vectors to
    // cluster 0 (iters = 0 exposes exactly that assignment)
    val qn = prep(Seq(
      0L -> Seq(1.0, 0.0), 1L -> Seq(1.0, 0.0),
      2L -> Seq(0.9, 0.1), 3L -> Seq(1.0, 0.1)))
    val tied = Similarity.kmeansAssign(qn, k = 2, iters = 0)
      .as[(Long, Int)].collect().toMap
    assert(tied.values.toSet == Set(0), s"all ties must resolve to cluster 0: $tied")
    // with update rounds, cluster 1 empties and must KEEP its init
    // centroid (127,0): cluster 0's centroid drifts to the member sum
    // (508,27), so the exact +x vectors (ids 0,1) score higher against the
    // preserved pure +x centroid and win back cluster 1 — exact integer
    // arithmetic, deterministic
    val got = Similarity.kmeansAssign(qn, k = 2, iters = 2)
      .as[(Long, Int)].collect().toMap
    assert(got == Map(0L -> 1, 1L -> 1, 2L -> 0, 3L -> 0), s"got $got")
  }

  test("assignment is deterministic across runs") {
    val emb = graft.Graft.table(spark, sf("sf0.001"), "embeddings")
      .select(col("vec_id").as("id"), Similarity.toDouble(col("embedding")).as("vec"))
    def run() = Similarity.kmeansAssign(Similarity.prepareQuantized(emb), 8, 2)
      .as[(Long, Int)].collect().toMap
    assert(run() == run())
  }

  test("blockCount scales k with n and floors at k0") {
    assert(Similarity.blockCount(500) == 8)    // sf0.01 gate scale
    assert(Similarity.blockCount(2000) == 8)   // sf0.1 gate scale
    assert(Similarity.blockCount(4096) == 8)
    assert(Similarity.blockCount(4097) == 8)   // ceil(4097/4096)=2 < k0
    assert(Similarity.blockCount(100000) == 25)          // ceil, not floor
    assert(Similarity.blockCount(1000000000L) == 244141) // linear in n
    assert(Similarity.blockCount(100, k0 = 4, targetBlockSize = 10) == 10)
  }

  test("parameterized k keeps block sizes <= target on replicated data; fixed k does not") {
    // 16 one-hot directions in 16-d, each replicated r = 50 times (ids
    // arranged so the k lowest ids cover all directions) — clustering is
    // exact, so block sizes are deterministic. With targetBlockSize = r,
    // blockCount(800) = ceil(800/50) = 16 and every block is exactly the
    // target; a fixed k0 = 8 leaves blocks at 2r — the quadratic pair
    // space the parameterization exists to prevent.
    val r = 50
    val rows = for (rep <- 0 until r; dir <- 0 until 16)
      yield ((rep * 16 + dir).toLong, Seq.tabulate(16)(i => if (i == dir) 1.0 else 0.0))
    val qn = prep(rows)
    val k = Similarity.blockCount(rows.size.toLong, k0 = 8, targetBlockSize = r.toLong)
    assert(k == 16)
    val sizes = Similarity.kmeansAssign(qn, k, iters = 1)
      .groupBy(col("cluster")).count().as[(Int, Long)].collect().toMap
    assert(sizes.size == 16 && sizes.values.forall(_ <= r),
      s"every block must stay <= target=$r: $sizes")
    val pairSpace = sizes.values.map(n => n * n).sum
    assert(pairSpace <= rows.size.toLong * r,
      s"blocked pair space must be <= n*target: $pairSpace")
    val fixedSizes = Similarity.kmeansAssign(qn, 8, iters = 1)
      .groupBy(col("cluster")).count().as[(Int, Long)].collect().toMap
    assert(fixedSizes.values.max > r,
      s"fixed k=8 should exceed the target block size here: $fixedSizes")
  }

  test("k larger than the input clamps to the collected seed count") {
    // 3 vectors, k = 10: without the clamp the centroid literal has 3
    // entries but the fold indexes 10 → ANSI element_at error (r8 advice)
    val qn = prep(Seq(
      0L -> Seq(1.0, 0.0), 1L -> Seq(0.0, 1.0), 2L -> Seq(1.0, 0.1)))
    val got = Similarity.kmeansAssign(qn, k = 10, iters = 2)
      .as[(Long, Int)].collect().toMap
    assert(got.keySet == Set(0L, 1L, 2L))
    assert(got.values.forall(c => c >= 0 && c < 3), s"clusters must index collected seeds: $got")
    // empty input keeps the (id, cluster) schema with zero rows
    val empty = Similarity.kmeansAssign(prep(Seq.empty), k = 4, iters = 2)
    assert(empty.columns.toSeq == Seq("id", "cluster") && empty.count() == 0)
  }

  test("final assignment plan is map-side: no shuffle, no join") {
    val emb = graft.Graft.table(spark, sf("sf0.001"), "embeddings")
      .select(col("vec_id").as("id"), Similarity.toDouble(col("embedding")).as("vec"))
    val plan = Similarity.kmeansAssign(Similarity.prepareQuantized(emb), 8, 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"),
      s"assignment must fold over broadcast-literal centroids, not join:\n$plan")
  }
}
