package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("repetitionStats counts n-gram occupancy exactly") {
    // doc 1: "a b a b a" → bigrams [a b, b a, a b, b a]: 4 total, top 2,
    //        all 4 occurrences belong to grams seen >= 2 times
    // doc 2: "x y z"     → bigrams [x y, y z]: 2 total, top 1, 0 dup
    // doc 3: "solo"      → no bigrams: absent from the output
    val docs = Seq(
      (1L, "a b a b a"), (2L, "x y z"), (3L, "solo")).toDF("doc_id", "text")
    val got = TextAnalysis.repetitionStats(docs, "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got == Map(1L -> ((4L, 2L, 4L)), 2L -> ((2L, 1L, 0L))))
  }

  test("ngramsFromTokens yields empty (not a degenerate gram) for short docs") {
    val got = Seq("one", "one two", "one two three").toDF("text")
      .select(TextAnalysis.ngramsFromTokens(TextAnalysis.tokens($"text"), 2).as("g"))
      .as[Seq[String]].collect()
    assert(got(0) == Seq.empty)
    assert(got(1) == Seq("one two"))
    assert(got(2) == Seq("one two", "two three"))
  }

  test("quality-gate predicates run unchanged on a stream (stateless, map-side)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def flags(df: org.apache.spark.sql.DataFrame) = {
      val tk = TextAnalysis.tokenCount(col("text"))
      df.select(col("doc_id"),
        (tk >= 3 && tk <= 5).as("wc_ok"),
        (TextAnalysis.stopwordCount(col("text")) >= 1).as("stop_ok"))
    }
    val rows = Seq(
      (1L, "the quick brown fox"), (2L, "tiny"),
      (3L, "a b c d e f g"), (4L, "words with the stopword here"))
    val in = MemoryStream[(Long, String)](spark)
    val q = flags(in.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("stream_quality").start()
    in.addData(rows: _*)
    q.processAllAvailable()
    val streamed = spark.table("stream_quality")
      .as[(Long, Boolean, Boolean)].collect().toSet
    q.stop()
    val batch = flags(rows.toDF("doc_id", "text"))
      .as[(Long, Boolean, Boolean)].collect().toSet
    assert(streamed == batch, "stream and batch flags must agree")
    assert(batch == Set((1L, true, true), (2L, false, false),
      (3L, false, true), (4L, true, true)))
  }
}
