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

  /** Driver-side sequential-greedy BPE with the library's exact contract
    * (frequency-weighted counts, (count desc, w1, w2) argmax, left-to-right
    * non-overlapping replace) — the in-memory reference the fuzz parity
    * below pins Bpe.train against. Kept embarrassingly direct on purpose.
    */
  private def referenceTrain(wordFreq: Map[String, Long], nMerges: Int)
      : List[(Int, String, String, String, Long)] = {
    var cur: Map[String, (Long, String)] = wordFreq.map { case (w, f) =>
      w -> ((f, w.map(c => s" $c").mkString + " "))
    }
    val out = scala.collection.mutable.ListBuffer
      .empty[(Int, String, String, String, Long)]
    var m = 1
    var done = false
    while (m <= nMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((_, (f, s)) <- cur) {
        val syms = s.trim.split(" ").filter(_.nonEmpty)
        syms.indices.dropRight(1).foreach { i =>
          val k = (syms(i), syms(i + 1))
          counts(k) = counts.getOrElse(k, 0L) + f
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((w1, w2), c) = counts.toSeq
          .sortBy { case ((a, b), n) => (-n, a, b) }.head
        out += ((m, w1, w2, w1 + w2, c))
        cur = cur.map { case (w, (f, s)) =>
          w -> ((f, s.replace(s" $w1 $w2 ", s" $w1$w2 ")))
        }
        m += 1
      }
    }
    out.toList
  }

  test("fuzz parity: train matches the in-memory sequential-greedy reference") {
    // small alphabets force interacting merges (runs, shared symbols, ties)
    // — exactly the surfaces where a batched or re-ordered induction would
    // split from sequential greedy; pins the contract the scaladoc ceiling
    // documents (one job per merge rank because ranks are data-dependent)
    import org.scalacheck.Gen
    val wordGen = for {
      len <- Gen.chooseNum(1, 7)
      cs <- Gen.listOfN(len, Gen.oneOf('a', 'b', 'c'))
    } yield cs.mkString
    val vocabGen = for {
      n <- Gen.chooseNum(1, 8)
      ws <- Gen.listOfN(n, wordGen)
      fs <- Gen.listOfN(n, Gen.chooseNum(1L, 5L))
    } yield ws.zip(fs).groupBy(_._1).map { case (w, l) => w -> l.map(_._2).sum }
    val vocabs = Gen.listOfN(6, vocabGen).sample.get
    vocabs.foreach { vocab =>
      val got = train(vocab.toSeq, 4)
      val want = referenceTrain(vocab, 4)
      assert(got == want, s"vocab $vocab: spark $got vs reference $want")
    }
  }

  test("fuzz parity: trainInMemory (heap + incremental counts) matches the reference") {
    // The fast driver-side trainer must be rule-for-rule identical to the
    // naive full-recount reference — interacting merges, odd runs, ties,
    // and count-revisits (a stale heap snapshot becoming valid again) all
    // live in small alphabets with many merges.
    import org.scalacheck.Gen
    val wordGen = for {
      len <- Gen.chooseNum(1, 9)
      cs <- Gen.listOfN(len, Gen.oneOf('a', 'b', 'c'))
    } yield cs.mkString
    val vocabGen = for {
      n <- Gen.chooseNum(1, 10)
      ws <- Gen.listOfN(n, wordGen)
      fs <- Gen.listOfN(n, Gen.chooseNum(1L, 5L))
    } yield ws.zip(fs).groupBy(_._1).map { case (w, l) => w -> l.map(_._2).sum }
    val vocabs = Gen.listOfN(25, vocabGen).sample.get
    vocabs.foreach { vocab =>
      val got = Bpe.trainInMemory(vocab.toArray, 12).toList
      val want = referenceTrain(vocab, 12)
      assert(got == want, s"vocab $vocab: local $got vs reference $want")
    }
  }

  test("trainLocal equals distributed train on the real corpus vocabulary") {
    import org.apache.spark.sql.functions._
    val words = spark.read.parquet(s"${sf()}/documents.parquet")
      .select(explode(graft.operators.TextAnalysis.tokens(col("text"))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("f"))
      .localCheckpoint(true)
    val dist = Bpe.train(words, 8).orderBy(col("merge_rank")).collect().toSeq
    val local = Bpe.trainLocal(words, 8).orderBy(col("merge_rank")).collect().toSeq
    assert(local == dist)
  }
}
