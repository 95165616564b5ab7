package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Proofs for the KMV bottom-k sketch behind q_agg_kmv_set_ops (rows-only
  * at the oracle gate — xxhash64 isn't reproducible in DuckDB SQL):
  * below-capacity exactness, EXACT merge (array equality, not estimate
  * closeness), partitioning determinism, the (k-1)/u_k accuracy envelope,
  * and the intersection estimator on sets with a known overlap.
  */
class KmvSpec extends SparkSpec {
  import spark.implicits._

  private val k = 256

  private def sketchOf(xs: Seq[Long]): Seq[Long] = {
    val kmv = udaf(new KmvAggregator(k))
    xs.toDF("v").select(xxhash64(col("v")).as("h"))
      .agg(kmv(col("h")).as("sk"))
      .collect().head.getSeq[Long](0).toSeq
  }

  test("below capacity the sketch is the distinct hash set — estimate exact") {
    val xs = (1L to 100L) ++ (1L to 100L) // duplicates must not count twice
    val sk = sketchOf(xs)
    assert(sk.size === 100)
    assert(KmvSketch.estimateDistinct(k, sk) === 100L)
  }

  test("merge of disjoint-part sketches equals the single-pass sketch, as arrays") {
    val all = (1L to 5000L)
    val parts = all.grouped(701).toSeq // uneven split, 8 parts
    val merged = parts.map(sketchOf).reduce((a, b) => KmvSketch.union(k, a, b))
    assert(merged === sketchOf(all))
    // associativity/commutativity: fold in reversed and shuffled order
    val rev = parts.map(sketchOf).reverse.reduce((a, b) => KmvSketch.union(k, b, a))
    assert(rev === merged)
  }

  test("sketch is identical across partitionings and runs") {
    val kmv = udaf(new KmvAggregator(k))
    val df = (1L to 20000L).toDF("v").select(xxhash64(col("v")).as("h"))
    val a = df.repartition(1).agg(kmv(col("h"))).collect().head.getSeq[Long](0)
    val b = df.repartition(13).agg(kmv(col("h"))).collect().head.getSeq[Long](0)
    val c = df.repartition(13).agg(kmv(col("h"))).collect().head.getSeq[Long](0)
    assert(a === b)
    assert(b === c)
  }

  test("distinct estimate lands inside the 4/sqrt(k) envelope at 20x capacity") {
    val n = 20 * k
    val est = KmvSketch.estimateDistinct(k, sketchOf((1L to n.toLong)))
    val tol = 4.0 / math.sqrt(k.toDouble) // ~4 sigma of the KMV estimator
    assert(math.abs(est - n).toDouble / n <= tol,
      s"estimate $est vs exact $n outside ±${(tol * 100).round}%")
  }

  test("intersection estimate tracks a known 50% overlap") {
    val a = sketchOf(1L to 4000L)
    val b = sketchOf(2001L to 6000L) // |A∩B| = 2000, |A∪B| = 6000
    val est = KmvSketch.estimateIntersection(k, a, b)
    // ratio estimator: sigma ≈ sqrt(rho(1-rho)/k) on rho=1/3 → ~3% of |A∪B|;
    // allow 4 sigma plus the union-estimate error.
    assert(math.abs(est - 2000L) <= 700L,
      s"intersection estimate $est vs exact 2000")
    // sanity: disjoint sets estimate (near) zero
    val dj = KmvSketch.estimateIntersection(k, sketchOf(1L to 3000L),
      sketchOf(10001L to 13000L))
    assert(dj <= 60L, s"disjoint intersection estimated $dj")
  }

  test("the catalog query emits every scope exactly once, estimates near exact") {
    val t = graft.Tables(spark, sf("sf0.01"))
    val out = graft.queries.AllQueries.all("q_agg_kmv_set_ops").run(t).collect()
    assert(out.length === 16) // 5 types + 10 pairs + ALL
    val allExact = out.find(_.getString(0) == "ALL").get.getLong(1).toDouble
    out.foreach { r =>
      val (exact, est) = (r.getLong(1), r.getLong(2))
      // single-set scopes follow the (k-1)/u_k envelope (±4/sqrt(k));
      // pair scopes add the ratio estimator's binomial sigma, bounded by
      // 0.5/sqrt(k) of the union size (≤ the global union) — 4 sigma each.
      val tol = math.max(4.0 / math.sqrt(k.toDouble) * exact,
        4.0 * 0.5 / math.sqrt(k.toDouble) * allExact)
      assert(math.abs(est - exact) <= tol,
        s"scope ${r.getString(0)}: est $est vs exact $exact (tol $tol)")
    }
  }

  test("merge laws hold over generated hash multisets (pure, no Spark)") {
    // The exact-merge claim as ALGEBRA, over adversarial generated inputs
    // (duplicates, negatives = high unsigned values, empties, sizes
    // straddling k): associativity + commutativity + idempotence +
    // capacity + unsigned sortedness. These five laws are exactly what the
    // aggregator's partial-merge tree and the streaming twin's
    // split-invariance rest on (PropertiesSpec style: Gen + plain asserts).
    import org.scalacheck.Gen
    val kk = 16
    val gen = Gen.listOf(Gen.oneOf(
      Gen.chooseNum(Long.MinValue, Long.MaxValue),
      Gen.chooseNum(-5L, 5L))) // dense small band forces duplicates
    def sample(): Seq[Long] =
      Iterator.continually(gen.sample).flatten.next()
    val rng = new scala.util.Random(7)
    (1 to 200).foreach { _ =>
      val (a, b, c) = (sample(), sample(), sample())
      val u = KmvSketch.union(kk, a, b)
      assert(u == KmvSketch.bottomK(kk, a ++ b))
      assert(u == KmvSketch.union(kk, b, a)) // commutative
      assert(KmvSketch.union(kk, KmvSketch.union(kk, a, b), c) ==
        KmvSketch.union(kk, a, KmvSketch.union(kk, b, c))) // associative
      assert(KmvSketch.union(kk, u, u) == u) // idempotent
      assert(u.size <= kk)
      assert(u == u.sortWith((x, y) => java.lang.Long.compareUnsigned(x, y) < 0))
      // order independence: any shuffle of the concatenation sketches equal
      assert(KmvSketch.bottomK(kk, rng.shuffle(a ++ b)) == u)
    }
  }
}
