package graft.queries

import graft.{SparkSpec, Tables}
import graft.operators.{ConnectedComponents, Dedup, Sampling}
import org.apache.spark.sql.functions._

/** Stage-composition invariants for q_pipeline_curate — the oracle proves
  * end-to-end value equality; this spec pins the INTERNAL contracts between
  * stages that the end-to-end hash can't localize when one breaks.
  */
class PipelineCurateSpec extends SparkSpec {

  private lazy val t = Tables(spark, sf())
  private lazy val docs = t.documents

  private lazy val bench = docs.filter(col("doc_id") < 5)
  private lazy val corpus = docs.filter(col("doc_id") >= 5)
  private lazy val sampled =
    Sampling.bernoulli(corpus, "doc_id", fraction = 0.9, salt = "curate")

  test("sampling keeps a strict, deterministic subset of the corpus") {
    val n = corpus.count()
    val k = sampled.count()
    assert(k > 0 && k <= n)
    // benchmark docs never enter the sampled corpus
    assert(sampled.filter(col("doc_id") < 5).isEmpty)
    // deterministic: a second evaluation selects the identical id set
    val again = Sampling.bernoulli(corpus, "doc_id", 0.9, "curate")
    assert(sampled.select("doc_id").exceptAll(again.select("doc_id")).isEmpty)
  }

  test("survivors are a subset of the sample with exactly one doc per near-dup cluster") {
    val pairs = Dedup.lshNearDupPairs(sampled, "doc_id", "text", threshold = 0.5)
    val survivors = ConnectedComponents.keepCanonical(sampled, "doc_id", pairs, "a", "b")
    assert(survivors.join(sampled, Seq("doc_id"), "left_anti").isEmpty)
    // no two survivors remain near-dups of each other
    val survIds = survivors.select(col("doc_id"))
    val residual = pairs
      .join(survIds.withColumnRenamed("doc_id", "a"), Seq("a"), "left_semi")
      .join(survIds.withColumnRenamed("doc_id", "b"), Seq("b"), "left_semi")
    assert(residual.isEmpty, "two near-dup docs both survived canonicalization")
  }

  test("the final packed output is clean, labeled, and in-range") {
    val out = AllQueries.all("q_pipeline_curate").run(t)
    val rows = out.collect()
    assert(rows.nonEmpty)
    // decontamination: no output doc shares >=2 shingle hashes with bench
    val outIds = out.select(col("doc_id"))
    val contaminated = Dedup.contaminationPairs(
      docs.join(outIds, Seq("doc_id"), "left_semi"), "doc_id", "text",
      bench, "doc_id", "text", minOverlap = 2)
    assert(contaminated.isEmpty, "a contaminated doc reached the packed output")
    // split labels and pack coordinates are well-formed
    assert(rows.forall(r => Set("train", "val").contains(r.getAs[String]("split"))))
    assert(rows.forall { r =>
      val shard = r.getAs[Long]("shard")
      shard >= 0 && shard < 4 && r.getAs[Long]("tok_offset") >= 0 &&
        r.getAs[Long]("chunk") == r.getAs[Long]("tok_offset") / 1024
    })
  }
}
