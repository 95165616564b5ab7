package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  /** Reference union-find, for cross-checking the distributed labeling. */
  private def ufLabels(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  private def ccOf(edges: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents.label(edges.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap

  test("chain, star, and disjoint components label to the component min") {
    val edges = Seq[(Long, Long)](
      (1L, 2L), (2L, 3L), (3L, 4L),       // chain 1-4
      (10L, 11L), (10L, 12L), (10L, 13L), // star rooted off-min
      (20L, 21L))                         // pair
    assert(ccOf(edges) == ufLabels(edges))
    assert(ccOf(edges)(4L) == 1L)
    assert(ccOf(edges)(13L) == 10L)
  }

  test("self-loops, duplicate and reversed edges are tolerated") {
    val edges = Seq[(Long, Long)]((5L, 5L), (1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L))
    val got = ccOf(edges)
    assert(got(1L) == 1L && got(2L) == 1L && got(3L) == 1L)
    assert(!got.contains(5L) || got(5L) == 5L) // pure self-loop drops out
  }

  test("long path converges within the iteration budget (log-round contraction)") {
    // 200-node path is the adversarial case for label propagation (O(n)
    // rounds); large-star/small-star must close it in O(log n).
    val edges = (1L until 200L).map(i => (i, i + 1))
    val got = ccOf(edges)
    assert(got.size == 200 && got.values.forall(_ == 1L))
  }

  test("random graphs agree with union-find") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val n = 60
      val edges = Seq.fill(50)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      assert(ccOf(edges) == ufLabels(edges), s"trial $trial")
    }
  }

  test("labelAll labels isolated vertices as their own component") {
    val verts = (1L to 10L).toDF("id")
    val edges = Seq[(Long, Long)]((2L, 4L), (4L, 6L)).toDF("a", "b")
    val got = ConnectedComponents.labelAll(verts, "id", edges, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 2L, 5L -> 5L,
      6L -> 2L, 7L -> 7L, 8L -> 8L, 9L -> 9L, 10L -> 10L))
  }

  test("keepCanonical keeps exactly one doc per cluster plus all unpaired docs") {
    val docs = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (5L, "e"))
      .toDF("doc_id", "text")
    val pairs = Seq[(Long, Long)]((2L, 5L), (5L, 3L)).toDF("a", "b")
    val kept = ConnectedComponents.keepCanonical(docs, "doc_id", pairs, "a", "b")
      .select($"doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L, 4L))
  }

  test("empty edge list: label is empty, labelAll is identity") {
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(ConnectedComponents.label(empty, "a", "b").isEmpty)
    val verts = (1L to 3L).toDF("id")
    val got = ConnectedComponents.labelAll(verts, "id", empty, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 2L, 3L -> 3L))
  }
}
