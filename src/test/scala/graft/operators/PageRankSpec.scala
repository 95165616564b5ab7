package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  /** Reference single-threaded replay of the exact integer recurrence. */
  private def refRanks(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val out = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var r = out.keys.map(_ -> PageRank.InitRank).toMap
    for (_ <- 1 to iters) {
      val contribs = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
      for ((u, vs) <- out; c = r(u) / vs.size; v <- vs)
        contribs(v) += c
      r = contribs.map { case (v, s) => v -> (150000L + 850L * s / 1000L) }.toMap
    }
    r
  }

  private def prOf(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    PageRank.run(edges.toDF("src", "dst"), iters)
      .as[(Long, Long)].collect().toMap

  test("symmetric triangle converges to equal ranks that match the replay") {
    val tri = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (1L, 3L), (3L, 1L))
    val got = prOf(tri, 5)
    assert(got == refRanks(tri, 5))
    assert(got.values.toSet.size == 1) // symmetric graph, equal mass
  }

  test("star graph concentrates rank on the hub, exactly as replayed") {
    // hub 0 <-> leaves 1..4, symmetrized
    val star = (1L to 4L).flatMap(l => Seq((0L, l), (l, 0L)))
    for (iters <- Seq(1, 3, 7)) {
      val got = prOf(star, iters)
      assert(got == refRanks(star, iters))
      assert(got(0L) > got(1L))
    }
    assert((1L to 4L).map(prOf(star, 3)).toSet.size == 1) // leaves tie
  }

  test("ranks are deterministic across runs (exact integer arithmetic)") {
    val edges = (0L until 40L).map(i => (i, (i * 7 + 3) % 40)) ++
      (0L until 40L).map(i => ((i * 7 + 3) % 40, i))
    val a = prOf(edges, 4)
    val b = prOf(edges, 4)
    assert(a == b)
    assert(a == refRanks(edges, 4))
  }
}
