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

  test("final assignment plan is map-side: no shuffle, no join") {
    val emb = graft.Graft.table(spark, sf("sf0.001"), "embeddings")
      .select(col("vec_id").as("id"), Similarity.toDouble(col("embedding")).as("vec"))
    val plan = Similarity.kmeansAssign(Similarity.prepareQuantized(emb), 8, 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"),
      s"assignment must fold over broadcast-literal centroids, not join:\n$plan")
  }
}
