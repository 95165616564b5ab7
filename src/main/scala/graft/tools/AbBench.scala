package graft.tools
import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession
import graft.Tables
import graft.operators.{Dedup, TextAnalysis}

/** Scratch A/B harness for the current perf question (contents change per
  * round; round 6: where does q_dedup_lsh_pairs' per-run cost go, and how
  * much would token-hash composition save vs rebuilding shingle strings?).
  */
object AbBench {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t = Tables(spark, "/root/testdata/sf0.1")
    def run(name: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      mk.write.format("noop").mode("overwrite").save() // warm
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[ab] $name%-28s ${times.sorted.apply(1)}%.3f s (median of 3)")
    }

    val docs = t.documents

    // stage 1: tokens only
    run("tokens") {
      docs.select(col("doc_id"), TextAnalysis.tokens(col("text")).as("tk"))
    }
    // stage 2: + shingle strings
    run("shingle-strings") {
      docs.select(col("doc_id"),
        Dedup.shinglesFromTokens(TextAnalysis.tokens(col("text"))).as("sh"))
    }
    // stage 3: + polyhash + distinct (current shd)
    run("shingle-hashes") {
      docs.select(col("doc_id"), Dedup.shingleHashes(col("text")).as("shd"))
    }
    // stage 4: + minhash signature
    run("signatures") {
      docs.select(col("doc_id"), Dedup.shingleHashes(col("text")).as("shd"))
        .withColumn("sig", Dedup.minhashSignature(col("shd")))
    }
    // full operator (localCheckpoint form, as the catalog runs it)
    run("lsh-pairs-full") {
      Dedup.lshNearDupPairs(docs, "doc_id", "text", threshold = 0.5)
    }
    // alternative kernel estimate: hash tokens once, combine 3 token hashes
    // per shingle arithmetically (no string rebuild, no per-char rescan)
    run("combined-token-hash") {
      val P = TextAnalysis.HashPrime
      val th = docs.select(col("doc_id"),
        transform(TextAnalysis.tokens(col("text")), c => Dedup.polyHash(c)).as("th"))
      th.select(col("doc_id"),
        array_distinct(transform(
          sequence(lit(1), greatest(size(col("th")) - 2, lit(1))),
          i => ((element_at(col("th"), i) * 31 + element_at(col("th"), i + 1)) % P * 31
            + element_at(col("th"), i + 2)) % P)).as("shd"))
    }
    spark.stop()
  }
}
