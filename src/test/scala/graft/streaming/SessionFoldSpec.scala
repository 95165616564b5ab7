package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

/** Property pins for the session fold's TAIL fast path (r15 review
  * finding): `sessionFoldStep` must equal the pure merge-insert for
  * EVERY input — not just the ascending cohorts the fold invariant
  * guarantees — because the fast path is a pure optimization, not a
  * semantic variant, and its `t < tailStart` fallback boundary is the
  * kind of off-by-one a refactor silently breaks. Pure JVM tests, no
  * Spark session.
  */
class SessionFoldSpec extends AnyFunSuite {
  private type Frag = (Long, Long, Long, Long)

  private def foldAll(ts: Seq[Long], gap: Long,
      step: (Vector[Frag], Long, Long, Long) => Vector[Frag]): Vector[Frag] =
    ts.foldLeft(Vector.empty[Frag])((fs, t) => step(fs, gap, t, 1L))

  private def invariants(fs: Vector[Frag], gap: Long, label: String): Unit = {
    // sorted by start, gap-separated, counts positive
    fs.sliding(2).foreach {
      case Vector((_, l1, _, _), (s2, _, _, _)) =>
        assert(l1 + gap < s2, s"$label: fragments not gap-separated: $fs")
      case _ => ()
    }
    fs.foreach { case (s, l, n, c) =>
      assert(s <= l && n >= 1 && c >= 1, s"$label: malformed fragment in $fs")
    }
  }

  test("fast path equals pure merge-insert on random ASCENDING cohorts (the fold regime)") {
    val rnd = new scala.util.Random(4217L)
    (1 to 300).foreach { i =>
      val gap = 1L + rnd.nextInt(50)
      val n = 1 + rnd.nextInt(60)
      val ts = Seq.fill(n)(rnd.nextInt(2000).toLong).sorted
      val fast = foldAll(ts, gap, StatefulOps.sessionFoldStep)
      val pure = foldAll(ts, gap,
        (fs, g, t, c) => StatefulOps.mergeInsertFragment(fs, g, t, c))
      assert(fast == pure, s"case $i (gap $gap, ts $ts): fast $fast vs pure $pure")
      invariants(fast, gap, s"case $i")
    }
  }

  test("fast path equals pure merge-insert on ARBITRARY (unsorted) inputs — the safety-net boundary") {
    // outside the fold invariant the fast path must fall back, never
    // diverge: same 300 cases, unsorted, including duplicates and
    // bridge-an-earlier-fragment shapes the tail branch cannot see
    val rnd = new scala.util.Random(9311L)
    (1 to 300).foreach { i =>
      val gap = 1L + rnd.nextInt(50)
      val n = 1 + rnd.nextInt(60)
      val ts = Seq.fill(n)(rnd.nextInt(2000).toLong)
      val fast = foldAll(ts, gap, StatefulOps.sessionFoldStep)
      val pure = foldAll(ts, gap,
        (fs, g, t, c) => StatefulOps.mergeInsertFragment(fs, g, t, c))
      assert(fast == pure, s"case $i (gap $gap, ts $ts): fast $fast vs pure $pure")
      invariants(fast, gap, s"case $i")
    }
  }

  test("boundary cells: ties, exactly-gap spacing, inside-tail, just-before-tail-start") {
    val g = 5L
    def step(fs: Vector[Frag], t: Long) = StatefulOps.sessionFoldStep(fs, g, t, 1L)
    // tie with the tail's last
    assert(step(Vector((10L, 12L, 2L, 2L)), 12L) == Vector((10L, 12L, 3L, 3L)))
    // exactly last + gap merges (<= rule); last + gap + 1 opens
    assert(step(Vector((10L, 12L, 2L, 2L)), 17L) == Vector((10L, 17L, 3L, 3L)))
    assert(step(Vector((10L, 12L, 2L, 2L)), 18L) ==
      Vector((10L, 12L, 2L, 2L), (18L, 18L, 1L, 1L)))
    // inside the tail's span
    assert(step(Vector((10L, 12L, 2L, 2L)), 11L) == Vector((10L, 12L, 3L, 3L)))
    // just before the tail's start, within gap: backward-extend via the
    // general path
    assert(step(Vector((10L, 12L, 2L, 2L)), 9L) == Vector((9L, 12L, 3L, 3L)))
    // bridging two fragments: only the general path can see both
    assert(step(Vector((0L, 1L, 1L, 1L), (8L, 12L, 2L, 2L)), 5L) ==
      Vector((0L, 12L, 4L, 4L)))
  }
}
