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
}
