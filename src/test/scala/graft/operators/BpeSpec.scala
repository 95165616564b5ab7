package graft.operators

import graft.SparkSpec

/** Unit contract for BPE merge-rule induction: hand-computed rule sequence,
  * frequency weighting, deterministic tie-breaks, the documented left-to-right
  * replace semantics on odd runs, and early exhaustion.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def train(words: Seq[(String, Long)], n: Int) =
    Bpe.train(words.toDF("word", "f"), n)
      .as[(Int, String, String, String, Long)].collect().toList

  test("hand-computed merges: frequency-weighted argmax per round") {
    // "low" ×5, "lower" ×2: round 1 pairs are (l,o)=7, (o,w)=7, (w,e)=2,
    // (e,r)=2 — tie at 7 breaks on (w1,w2) ascending → (l,o). Round 2:
    // (lo,w)=7 wins.
    val got = train(Seq("low" -> 5L, "lower" -> 2L), 2)
    assert(got == List(
      (1, "l", "o", "lo", 7L),
      (2, "lo", "w", "low", 7L)))
  }

  test("odd runs merge left-to-right non-overlapping (documented semantics)") {
    // "aaaa": round 1 (a,a)=3 → ' aa a a ' (NOT ' aa aa '); round 2 pairs
    // are (aa,a)=1 and (a,a)=1 — tie breaks to (a,a).
    val got = train(Seq("aaaa" -> 1L), 2)
    assert(got == List(
      (1, "a", "a", "aa", 3L),
      (2, "a", "a", "aa", 1L)))
  }

  test("segment applies learned rules in rank order") {
    val words = Seq("low" -> 5L, "lower" -> 2L).toDF("word", "f")
    val merges = Bpe.train(words, 2)
      .as[(Int, String, String, String, Long)].collect().toList
      .map(m => (m._2, m._3))
    val got = Bpe.segment(words, merges)
      .as[(String, Long, Seq[String])].collect()
      .map { case (w, f, p) => w -> ((f, p)) }.toMap
    assert(got("low") == ((5L, Seq("low"))))
    assert(got("lower") == ((2L, Seq("low", "e", "r"))))
  }

  test("exhaustion stops early: single-symbol words have no pairs") {
    assert(train(Seq("a" -> 9L, "b" -> 3L), 4).isEmpty)
    // one mergeable word: after its symbols fuse there is nothing left
    val got = train(Seq("ab" -> 2L, "c" -> 5L), 4)
    assert(got == List((1, "a", "b", "ab", 2L)))
  }
}
