package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Algebraic laws for the top-k Aggregator (previously gated only by the
  * q_udaf_topk oracle): the O(1)-reject fast path in `reduce` must be
  * indistinguishable from re-sorting the whole buffer — including its
  * tie-break arm (equal score, higher tag loses to the floor) — and
  * `merge` must be associative/commutative so Spark's partial-merge tree
  * can combine buffers in any shape. Pure JVM checks over generated
  * inputs, no Spark session (PropertiesSpec style: Gen + plain asserts).
  */
class TopKAggregatorSpec extends AnyFunSuite {
  import org.scalacheck.Gen

  private val k = 4
  private val agg = new TopKAggregator(k)

  /** Ground truth: full sort of everything, take k. */
  private def truth(xs: Seq[ScoredTag]): Seq[ScoredTag] =
    xs.sortBy(s => (-s.score, s.tag)).take(k)

  // few distinct scores + few tags → dense ties, the fast path's hard arm
  private val gen = Gen.listOf(for {
    s <- Gen.oneOf(0.0, 1.0, 2.0, 2.0, 3.0)
    t <- Gen.chooseNum(0L, 6L)
  } yield ScoredTag(s, t))

  private def sample(): List[ScoredTag] =
    Iterator.continually(gen.sample).flatten.next()

  test("reduce-fold over any arrival order equals sort-everything-take-k") {
    val rng = new scala.util.Random(5)
    (1 to 300).foreach { _ =>
      val xs = sample()
      val folded = rng.shuffle(xs).foldLeft(agg.zero)(agg.reduce)
      assert(folded == truth(xs),
        s"fold diverged from full sort on $xs: $folded vs ${truth(xs)}")
    }
  }

  test("merge is associative and commutative and caps at k") {
    (1 to 300).foreach { _ =>
      val (a, b, c) = (sample(), sample(), sample())
      def buf(xs: Seq[ScoredTag]) = xs.foldLeft(agg.zero)(agg.reduce)
      val (ba, bb, bc) = (buf(a), buf(b), buf(c))
      assert(agg.merge(ba, bb) == agg.merge(bb, ba))
      assert(agg.merge(agg.merge(ba, bb), bc) == agg.merge(ba, agg.merge(bb, bc)))
      assert(agg.merge(ba, bb) == truth(a ++ b))
      assert(agg.merge(ba, bb).size <= k)
    }
  }
}
