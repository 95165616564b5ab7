package graft

import graft.functions.Scalars
import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Property-based invariants (SURVEY.md §5.2): totality and algebraic
  * identities checked over generated inputs, evaluated through real Spark
  * plans in batches (one plan per property, not per sample).
  */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  test("priority decode is total over Long and only emits the four labels") {
    val samples = Gen.listOfN(200, Gen.chooseNum(Long.MinValue, Long.MaxValue)).sample.get
    val labels = (samples ++ Seq(1L, 2L, 3L, 0L, -1L, Long.MaxValue, Long.MinValue))
      .toDF("p").select(Scalars.priorityLabel($"p")).as[String].collect().toSet
    assert(labels.subsetOf(Set("High", "Medium", "Low", "Informational")))
  }

  test("time bucket: bucket <= t, divisible by n, within n of t (positive epochs)") {
    val samples = Gen.listOfN(300, Gen.chooseNum(0L, 4102444800L)).sample.get
    val rows = samples.toDF("t")
      .select($"t", Scalars.timeBucket($"t", 900L).as("b"))
      .as[(Long, Long)].collect()
    rows.foreach { case (t, b) =>
      assert(b % 900 == 0 && b <= t && t - b < 900)
    }
  }

  test("explode preserves total metric count (sum of array sizes)") {
    val gen = Gen.listOfN(50, Gen.chooseNum(0, 8))
    val sizes = gen.sample.get
    val df = sizes.zipWithIndex
      .map { case (n, i) => (i.toLong, Seq.tabulate(n)(_.toLong)) }
      .toDF("id", "metrics")
    val exploded = df.select($"id", explode($"metrics"))
    assert(exploded.count() == sizes.map(_.toLong).sum)
  }

  test("native dedup kernels match composed forms on generated text (whitespace fuzz)") {
    // alphabet deliberately includes every divergence surface: space runs,
    // tabs/newlines (space-only trim!), repeated tokens, unicode, empties
    val tokenGen = Gen.oneOf(
      Gen.stringOfN(3, Gen.alphaNumChar),
      Gen.oneOf("a", "aa", "κόσμος", "日本", "", "x"))
    val sepGen = Gen.oneOf(" ", "  ", "\t", "\n", " \t ")
    val docGen = for {
      n <- Gen.chooseNum(0, 12)
      toks <- Gen.listOfN(n, tokenGen)
      seps <- Gen.listOfN(math.max(n - 1, 0) + 2, sepGen)
    } yield seps.head + toks.zip(seps.tail).map { case (t, s) => t + s }.mkString
    val docs = Gen.listOfN(300, docGen).sample.get
    val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val th = df.select(
      Dedup.tokenHashesFromText($"text").as("fast_th"),
      Dedup.tokenHashes(graft.operators.TextAnalysis.tokens($"text")).as("slow_th"))
    assert(th.filter($"fast_th" =!= $"slow_th").count() == 0)
    val rest = df
      .select($"id", Dedup.tokenHashes(graft.operators.TextAnalysis.tokens($"text")).as("th"), $"text")
      .select(
        Dedup.shingleHashesFromTokenHashes($"th").as("fast_shd"),
        Dedup.shingleHashesFromTokenHashesComposed($"th").as("slow_shd"),
        Dedup.simhash($"text").as("fast_sim"),
        Dedup.simhashComposed($"text").as("slow_sim"))
      .withColumn("fast_sig", Dedup.minhashSignature($"fast_shd"))
      .withColumn("slow_sig", Dedup.minhashSignatureComposed($"slow_shd"))
    assert(rest.filter(
      $"fast_shd" =!= $"slow_shd" || $"fast_sim" =!= $"slow_sim" ||
        $"fast_sig" =!= $"slow_sig").count() == 0)
  }

  test("exact dedup is idempotent and keeps one representative per key") {
    val samples = Gen.listOfN(300, Gen.chooseNum(0, 30)).sample.get
    val df = samples.zipWithIndex.map { case (k, i) => (i.toLong, s"key$k") }.toDF("id", "k")
    val once = df.groupBy($"k").agg(min($"id").as("id"))
    val twice = once.groupBy($"k").agg(min($"id").as("id"))
    assert(once.count() == samples.distinct.size)
    assert(once.orderBy("k").collect().toSeq == twice.orderBy("k").collect().toSeq)
  }

  test("window-bucketed groupBy equals groupBy on the bucket column") {
    val events = Graft.table(spark, sf(), "events")
    val viaWindow = events
      .groupBy(window($"ts", "900 seconds"))
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp($"window.start").as("b"), $"n")
    val viaBucket = events
      .groupBy(Scalars.timeBucket(unix_timestamp($"ts"), 900L).as("b"))
      .agg(count(lit(1)).as("n"))
    assert(viaWindow.orderBy("b").collect().toSeq == viaBucket.orderBy("b").collect().toSeq)
  }

  test("jaccard is symmetric and bounded [0,1] on generated sets") {
    val gen = Gen.listOfN(20, Gen.nonEmptyListOf(Gen.chooseNum(1L, 40L)))
    val pairsData = gen.sample.get.grouped(2).collect { case Seq(a, b) => (a, b) }.toSeq
    val rows = pairsData.toDF("a", "b")
      .select(
        Dedup.jaccard($"a", $"b").as("jab"),
        Dedup.jaccard($"b", $"a").as("jba"))
      .as[(Double, Double)].collect()
    rows.foreach { case (jab, jba) =>
      assert(jab == jba && jab >= 0.0 && jab <= 1.0)
    }
  }

  test("AsOf.nearest matches a brute-force argmin on generated timelines") {
    // Random keyed timelines with deliberate collisions: small time range
    // so same-instant rows, exact two-sided ties, and empty-key cases all
    // occur. Right side is collapsed per (key, time) — the same
    // determinism precondition the catalog anchor states.
    val gen = for {
      k <- Gen.chooseNum(1L, 4L)
      t <- Gen.chooseNum(0L, 30L)
      id <- Gen.chooseNum(1L, 1000000L)
    } yield (k, t, id)
    val leftRows = Gen.listOfN(60, gen).sample.get
    val rightRows = Gen.listOfN(25, gen).sample.get
      .groupBy(r => (r._1, r._2)).map { case ((k, t), rs) => (k, t, rs.map(_._3).max) }.toSeq
    val l = leftRows.zipWithIndex.map { case ((k, t, _), i) => (k, i.toLong, t) }
      .toDF("k", "eid", "t")
    val r = rightRows.map { case (k, t, id) => (k, id, t) }.toDF("k", "rid", "t")
    val got = operators.AsOf.nearest(l, r, "k", "t", "t", Seq("rid"))
      .select($"eid", $"asof_rid").as[(Long, Option[Long])].collect().toMap
    leftRows.zipWithIndex.foreach { case ((k, t, _), i) =>
      val cands = rightRows.filter(_._1 == k)
      val expected = if (cands.isEmpty) None else {
        // min |Δt|; earlier wins ties (sort by (|Δt|, rightTime))
        val best = cands.minBy(c => (math.abs(c._2 - t), c._2))
        Some(best._3)
      }
      assert(got(i.toLong) == expected,
        s"key=$k t=$t: got ${got(i.toLong)}, expected $expected from $cands")
    }
  }

  test("BPE train+segment matches a single-threaded reference replay on random corpora") {
    // Random small word-frequency tables over a tiny alphabet (so merges
    // actually fire, including the 3+-identical-symbol runs where the
    // documented left-to-right replace semantics diverge from
    // simultaneous-scan BPE). The reference replay below re-implements
    // training and segmentation with plain java.lang.String.replace — the
    // same left-to-right non-overlapping contract Spark's `replace` has —
    // so both the induced rule SEQUENCE and the segment output must match
    // exactly (r9 verdict task 7).
    val wordGen = for {
      n <- Gen.chooseNum(1, 6)
      cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c'))
    } yield cs.mkString
    val corpusGen = for {
      nw <- Gen.chooseNum(1, 12)
      ws <- Gen.listOfN(nw, wordGen)
      fs <- Gen.listOfN(nw, Gen.chooseNum(1L, 9L))
    } yield ws.zip(fs).groupBy(_._1).map { case (w, l) => (w, l.map(_._2).sum) }.toSeq

    def spacedRef(w: String): String = " " + w.mkString(" ") + " "
    def refTrain(words: Seq[(String, Long)], nMerges: Int)
      : (Seq[(String, String)], Map[String, String]) = {
      var cur = words.map { case (w, f) => (w, f, spacedRef(w)) }
      val rules = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      var go = true
      while (rules.size < nMerges && go) {
        val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        cur.foreach { case (_, f, s) =>
          val syms = s.trim.split(" ")
          if (syms.length >= 2) syms.sliding(2).foreach { p =>
            counts((p(0), p(1))) = counts.getOrElse((p(0), p(1)), 0L) + f
          }
        }
        if (counts.isEmpty) go = false
        else {
          val ((w1, w2), _) = counts.toSeq
            .minBy { case ((a, b), c) => (-c, a, b) }
          rules += ((w1, w2))
          cur = cur.map { case (w, f, s) =>
            (w, f, s.replace(s" $w1 $w2 ", s" $w1$w2 "))
          }
        }
      }
      (rules.toSeq, cur.map { case (w, _, s) => w -> s.trim }.toMap)
    }

    (1 to 5).foreach { _ =>
      val corpus = corpusGen.sample.get
      val wf = corpus.toDF("word", "f")
      val got = operators.Bpe.train(wf, nMerges = 8)
        .orderBy($"merge_rank")
        .select($"w1", $"w2").as[(String, String)].collect().toSeq
      val (want, wantSeg) = refTrain(corpus, nMerges = 8)
      assert(got == want, s"merge rules diverged on corpus $corpus")
      val seg = operators.Bpe.segment(wf, got)
        .select($"word", array_join($"pieces", " "))
        .as[(String, String)].collect().toMap
      assert(seg == wantSeg, s"segmentation diverged on corpus $corpus")
    }
  }

  test("vocab encode matches a single-threaded reference replay on random docs") {
    // Same fuzz treatment for the other stateful text op (r9 verdict task
    // 7): random docs over >64 distinct tokens so the top-64 vocab cutoff,
    // OOV id 0, count/term tie-breaks, and the empty-text tokenizer quirk
    // (split of "" → [""]) all occur. The replay recomputes the encoding
    // with plain Scala collections.
    val tokGen = for {
      c1 <- Gen.oneOf('a' to 'j')
      c2 <- Gen.option(Gen.oneOf('a' to 'j'))
    } yield c1.toString + c2.map(_.toString).getOrElse("")
    val docGen = for {
      n <- Gen.chooseNum(0, 15)
      ts <- Gen.listOfN(n, tokGen)
    } yield ts.mkString(" ")
    val docs = Gen.listOfN(120, docGen).sample.get.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val df = docs.toDF("doc_id", "text")

    // Spark side — the q_text_vocab_encode chain on this frame
    val toks = df.select($"doc_id",
      posexplode(operators.TextAnalysis.tokens($"text")).as(Seq("pos", "term")))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy($"cnt".desc, $"term".asc)
    val vocab = toks.groupBy($"term").agg(count(lit(1)).as("cnt"))
      .orderBy($"cnt".desc, $"term".asc).limit(64)
      .withColumn("tid", row_number().over(w).cast("long"))
    val got = toks.join(broadcast(vocab.select($"term", $"tid")), Seq("term"), "left")
      .withColumn("tid", coalesce($"tid", lit(0L)))
      .groupBy($"doc_id")
      .agg(array_join(transform(array_sort(collect_list(struct($"pos", $"tid"))),
        s => s.getField("tid")), " ").as("ids"))
      .as[(Long, String)].collect().toMap

    // Reference replay
    val tokenized = docs.map { case (id, t) => id -> t.trim.split("\\s+").toSeq }
    val refVocab = tokenized.flatMap(_._2).groupBy(identity)
      .map { case (t, l) => (t, l.size.toLong) }.toSeq
      .sortBy { case (t, c) => (-c, t) }.take(64)
      .zipWithIndex.map { case ((t, _), i) => t -> (i + 1).toLong }.toMap
    tokenized.foreach { case (id, ts) =>
      val want = ts.map(t => refVocab.getOrElse(t, 0L)).mkString(" ")
      assert(got(id) == want, s"doc $id (${ts.mkString("|")}): got ${got(id)}, want $want")
    }
  }

  test("weighted median crossing test matches brute-force expansion") {
    // Expand each (value, weight) into weight copies; the weighted median
    // must equal the smallest value v where 2·rank(v) ≥ total copies —
    // the same statistic the catalog query computes without expansion.
    val gen = for {
      g <- Gen.oneOf("a", "b")
      v <- Gen.chooseNum(1L, 20L)
      w <- Gen.chooseNum(1L, 9L)
    } yield (g, v, w)
    val rows = Gen.listOfN(80, gen).sample.get
    val byVal = rows.toDF("g", "c", "wt")
      .groupBy($"g", $"c").agg(sum($"wt").as("w"))
    val cum = org.apache.spark.sql.expressions.Window
      .partitionBy($"g").orderBy($"c")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val all = org.apache.spark.sql.expressions.Window.partitionBy($"g")
    val got = byVal
      .select($"g", $"c", sum($"w").over(cum).as("cw"), sum($"w").over(all).as("tw"))
      .filter($"cw" * 2 >= $"tw")
      .groupBy($"g").agg(min($"c").as("m"))
      .as[(String, Long)].collect().toMap
    rows.groupBy(_._1).foreach { case (g, rs) =>
      val copies = rs.flatMap { case (_, v, w) => Seq.fill(w.toInt)(v) }.sorted
      val n = copies.size
      val expected = copies.zipWithIndex
        .collectFirst { case (v, i) if 2 * (i + 1) >= n => v }.get
      assert(got(g) == expected, s"group $g: got ${got(g)}, expected $expected")
    }
  }

  /** Generated keyed series (key, position, value) with contiguous
    * positions — the shared input shape for the three stateful-rewrite
    * fuzz tests below.
    */
  private def genSeries(nKeys: Int, maxLen: Int, lo: Long, hi: Long): Seq[(Long, Long, Long)] =
    (1 to nKeys).flatMap { k =>
      val len = Gen.chooseNum(1, maxLen).sample.get
      (1 to len).map(i => (k.toLong, i.toLong,
        Gen.chooseNum(lo, hi).sample.get))
    }

  test("CUSUM prefix-min identity matches the sequential recursion on signed series") {
    // q_ts_cusum's rewrite: S_t = P_t − min(0, min P_j) must equal the
    // textbook recursion S_t = max(0, S_{t−1} + dev_t) — on deviations of
    // BOTH signs (the identity's whole point is surviving negative runs).
    import org.apache.spark.sql.expressions.Window
    val rows = genSeries(4, 40, -50L, 50L)
    val w = Window.partitionBy($"k").orderBy($"i")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val got = rows.toDF("k", "i", "v")
      .withColumn("p", sum($"v").over(w))
      .withColumn("s", $"p" - least(min($"p").over(w), lit(0L)))
      .select($"k", $"i", $"s").as[(Long, Long, Long)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    rows.groupBy(_._1).foreach { case (k, rs) =>
      var s = 0L
      rs.sortBy(_._2).foreach { case (_, i, v) =>
        s = math.max(0L, s + v)
        assert(got((k, i)) == s, s"key $k pos $i: got ${got((k, i))}, want $s")
      }
    }
  }

  test("EWMA forward-explode matches the direct weighted sum on generated series") {
    // q_ts_ewma's rewrite (r18 shape): each row pushes v·2^(D−j) to
    // positions rn..rn+D and carries its identity on the j = 0 row (the
    // day0 trick) — the (key, position) aggregate, with groups lacking a
    // j = 0 self-row dropped, must equal the straight trailing-window
    // weighted sum computed per row, with no join back.
    import org.apache.spark.sql.expressions.Window
    val D = 4
    val rows = genSeries(3, 25, 0L, 1000L)
    val df = rows.toDF("k", "rn", "v")
    val got = df
      .select($"k".as("ck"), $"rn", $"v",
        explode(sequence(lit(0), lit(D))).as("j"))
      .select($"ck", ($"rn" + $"j").as("target"),
        expr(s"v * shiftleft(cast(1 as bigint), $D - j)").as("wv"),
        expr(s"shiftleft(cast(1 as bigint), $D - j)").as("w"),
        when($"j" === 0, $"rn").as("self0"))
      .groupBy($"ck", $"target")
      .agg(sum($"wv").as("num"), sum($"w").as("den"), max($"self0").as("self"))
      .filter($"self".isNotNull)
      .select($"ck", $"self", expr("num * 1000 div den").as("e"))
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    rows.groupBy(_._1).foreach { case (k, rs) =>
      val byPos = rs.map(r => r._2 -> r._3).toMap
      rs.foreach { case (_, t, _) =>
        val terms = (0 to D).flatMap { lag =>
          byPos.get(t - lag).map(v => (v * (1L << (D - lag)), 1L << (D - lag)))
        }
        val want = terms.map(_._1).sum * 1000 / terms.map(_._2).sum
        assert(got((k, t)) == want, s"key $k pos $t: got ${got((k, t))}, want $want")
      }
    }
  }

  test("rolling-median forward-explode matches sorted-slice lower medians") {
    // q_ts_rolling_median's rewrite (r18 shape): bounded forward explode +
    // ONE (key, position) group collecting the ≤W-row frame, lower median
    // = sorted frame's ⌈n/2⌉-th element, identity carried on the j = 0
    // self-row — must equal the lower median of each trailing W-row slice
    // taken directly (ties included: the generated range is small).
    val W = 3 // trailing rows: rn−2..rn
    val rows = genSeries(3, 20, 0L, 30L) // small range → ties occur
    val df = rows.toDF("k", "rn", "v")
    val got = df
      .select($"k".as("ck"), $"rn", $"v", explode(sequence(lit(0), lit(W - 1))).as("j"))
      .select($"ck", ($"rn" + $"j").as("target"), $"v",
        when($"j" === 0, $"rn").as("self0"))
      .groupBy($"ck", $"target")
      .agg(max($"self0").as("self"), sort_array(collect_list($"v")).as("vs"))
      .filter($"self".isNotNull)
      .select($"ck", $"self",
        expr("element_at(vs, cast((size(vs) + 1) div 2 as int))").as("m"))
      .as[(Long, Long, Long)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    rows.groupBy(_._1).foreach { case (k, rs) =>
      val byPos = rs.map(r => r._2 -> r._3).toMap
      rs.foreach { case (_, t, _) =>
        val slice = ((t - W + 1) to t).flatMap(byPos.get).sorted
        val want = slice.zipWithIndex
          .collectFirst { case (v, i) if 2 * (i + 1) >= slice.size => v }.get
        assert(got((k, t)) == want, s"key $k pos $t: got ${got((k, t))}, want $want")
      }
    }
  }
}
