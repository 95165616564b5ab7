package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("polynomial fingerprint golden: 'abc' → 96354 (matches DuckDB list_reduce)") {
    val got = Seq("abc").toDF("t").select(TextAnalysis.fingerprint($"t")).as[Long].head()
    assert(got == 96354L)
  }

  test("shingles: k=3 word windows; short docs yield one shingle") {
    val got = Seq("a b c d e", "a b").toDF("t")
      .select(Dedup.shingles($"t").as("sh")).as[Seq[String]].collect()
    assert(got(0) == Seq("a b c", "b c d", "c d e"))
    assert(got(1) == Seq("a b"))
  }

  test("MinHash-LSH finds planted near-dups, not distinct docs") {
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val nearDup = (1 to 60).map(i => if (i == 30) "CHANGED" else s"tok$i").mkString(" ")
    val unrelated = (100 to 160).map(i => s"other$i").mkString(" ")
    val docs = Seq((1L, base), (2L, nearDup), (3L, unrelated)).toDF("doc_id", "text")
    val pairs = Dedup.lshNearDupPairs(docs, "doc_id", "text", threshold = 0.5)
      .select($"a", $"b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("scoped LSH pass releases the signature cache after use") {
    // identical texts: J = 1, signatures equal, a band collision is
    // GUARANTEED — this test pins cache release, not LSH recall, so the
    // pair must exist regardless of how the hash function rolls
    val docs = Seq((1L, "a b c d e f g h"), (2L, "a b c d e f g h"))
      .toDF("doc_id", "text")
    // Count CacheManager entries, not getPersistentRDDs: the latter also
    // lists ContextCleaner-owned localCheckpoint RDDs (from the convenience
    // form used elsewhere in this suite) whose async cleanup makes the
    // count race with GC. The scoped form's leak signature is a cache()
    // entry, which only an explicit unpersist removes.
    spark.catalog.clearCache()
    val n = Dedup.lshNearDupPairsScoped(docs, "doc_id", "text", threshold = 0.1)(_.count())
    assert(n >= 1L)
    assert(spark.sharedState.cacheManager.isEmpty) // release() ran
  }

  test("convenience LSH pass leaves no CacheManager entry (round-5 leak)") {
    // identical texts for a guaranteed pair — see the scoped test above
    val docs = Seq((1L, "a b c d e f g h"), (2L, "a b c d e f g h"))
      .toDF("doc_id", "text")
    spark.catalog.clearCache()
    val n = Dedup.lshNearDupPairs(docs, "doc_id", "text", threshold = 0.1).count()
    assert(n >= 1L)
    // cache() entries live in the CacheManager until an explicit unpersist
    // nobody issues on this path; localCheckpoint blocks are ContextCleaner-
    // owned instead and never appear here.
    assert(spark.sharedState.cacheManager.isEmpty)
  }

  test("contamination: planted benchmark phrase is found; clean docs are not") {
    val benchPhrase = "the quick brown fox jumps over the lazy dog"
    val bench = Seq((1L, benchPhrase)).toDF("doc_id", "text")
    val train = Seq(
      (10L, s"intro words then $benchPhrase and a tail"), // contains the phrase
      (11L, "entirely unrelated content with no overlap at all here"),
      (12L, "the quick brown fox appears briefly")         // 2 shared shingles
    ).toDF("doc_id", "text")
    val got = Dedup.contaminationPairs(train, "doc_id", "text",
      bench, "doc_id", "text", minOverlap = 2)
      .select($"train_id", $"bench_id", $"n_shared")
      .as[(Long, Long, Long)].collect().toSet
    assert(got.map(_._1) == Set(10L, 12L), s"got $got")
    // doc 10 embeds the whole 9-token phrase: all 7 of its 3-shingles shared
    assert(got.find(_._1 == 10L).get._3 == 7L)
    // the benchmark side must broadcast (train never shuffles for the join)
    val plan = Dedup.contaminationPairs(train, "doc_id", "text",
      bench, "doc_id", "text").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"expected broadcast contamination join:\n$plan")
  }

  test("simhash: identical docs hash equal; near-dups within small hamming") {
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val nearDup = (1 to 60).map(i => if (i == 30) "CHANGED" else s"tok$i").mkString(" ")
    val df = Seq((1L, base), (2L, base), (3L, nearDup)).toDF("id", "t")
      .select($"id", Dedup.simhash($"t").as("s"))
    val m = df.as[(Long, Long)].collect().toMap
    assert(m(1L) == m(2L))
    assert(java.lang.Long.bitCount(m(1L) ^ m(3L)) <= 4)
  }

  test("native simhash expression is bit-identical to the composed form") {
    // real corpus text plus the edge shapes where trim/split semantics
    // could diverge: empty, all-space, inner runs, non-space whitespace
    // (Spark trim strips U+0020 only — Java String.trim would differ)
    val edges = Seq("", "   ", "a  b", " a\tb ", "x\ny", "a b\n", "\tlead")
      .zipWithIndex.map { case (s, i) => (100000L + i, s) }
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
    val df = (docs ++ edges).toDF("doc_id", "text")
      .select(Dedup.simhash($"text").as("fast"),
        Dedup.simhashComposed($"text").as("slow"))
    assert(df.filter($"fast" =!= $"slow").count() == 0)
  }

  test("native shingle/signature expressions are bit-identical to the composed forms") {
    // real corpus plus short-doc edges (fewer tokens than the shingle
    // width folds one clamped window; empty text hashes the [""] token)
    val edges = Seq("", "one", "one two", "a a a a a")
      .zipWithIndex.map { case (s, i) => (100000L + i, s) }
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
    val corpus = (docs ++ edges).toDF("doc_id", "text")
    val tokenParity = corpus.select(
      Dedup.tokenHashesFromText($"text").as("fast"),
      Dedup.tokenHashes(graft.operators.TextAnalysis.tokens($"text")).as("slow"))
    assert(tokenParity.filter($"fast" =!= $"slow").count() == 0)
    val th = corpus
      .select(Dedup.tokenHashes(graft.operators.TextAnalysis.tokens($"text")).as("th"))
    val shd = th.select(
      Dedup.shingleHashesFromTokenHashes($"th").as("fast"),
      Dedup.shingleHashesFromTokenHashesComposed($"th").as("slow"))
    assert(shd.filter($"fast" =!= $"slow").count() == 0)
    val sig = th.select(Dedup.shingleHashesFromTokenHashes($"th").as("shd"))
      .select(Dedup.minhashSignature($"shd").as("fast"),
        Dedup.minhashSignatureComposed($"shd").as("slow"))
    assert(sig.filter($"fast" =!= $"slow").count() == 0)
  }

  test("jaccard: exact set semantics") {
    val got = Seq((Seq(1L, 2L, 3L), Seq(2L, 3L, 4L)))
      .toDF("a", "b").select(Dedup.jaccard($"a", $"b")).as[Double].head()
    assert(math.abs(got - 0.5) < 1e-12)
  }

  test("langId picks the max-marker language deterministically") {
    val got = Seq("der hund und die katze ist da", "the cat and the dog is here")
      .toDF("t").select(TextAnalysis.langId($"t")).as[String].collect().toSeq
    assert(got == Seq("de", "en"))
  }
}
