package graft.functions

import graft.SparkSpec
import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Bit-parity fence for the fused native vector kernels against the
  * composed HOF forms they replace — the contract that lets the DuckDB
  * oracles written against the composed forms gate the kernels too.
  */
class VectorKernelSpec extends SparkSpec {
  import spark.implicits._

  private def emb = spark.read
    .parquet(s"${sf()}/embeddings.parquet")
    .select(col("vec_id").as("id"),
      Similarity.toDouble(col("embedding")).as("vec"))

  test("native cosine is bit-identical to the composed form on all real pairs") {
    val a = emb.select(col("id").as("aid"), col("vec").as("av"))
    val b = emb.select(col("id").as("bid"), col("vec").as("bv"))
    // Bounded all-pairs: query side is a small fixed sample (brute-force contract).
    val pairs = a.filter(col("aid") < 20).crossJoin(broadcast(b))
    val diff = pairs
      .select(
        Similarity.cosineComposed(col("av"), col("bv")).as("composed"),
        Similarity.cosineNative(col("av"), col("bv")).as("native"))
      .filter(col("composed") =!= col("native")) // bitwise: any ULP difference shows
      .count()
    assert(diff === 0L)
  }

  test("native int64 dot is bit-identical to the composed intDot") {
    val q = emb
      .withColumn("__ma", Similarity.maxAbs(col("vec")))
      .select(col("id"), Similarity.quantize(col("vec"), col("__ma")).as("qv"))
    val a = q.select(col("id").as("aid"), col("qv").as("aq"))
    val b = q.select(col("id").as("bid"), col("qv").as("bq"))
    val diff = a.filter(col("aid") < 20).crossJoin(broadcast(b))
      .select(
        Similarity.intDotComposed(col("aq"), col("bq")).as("composed"),
        graft.functions.DotProductLongExpression.column(col("aq"), col("bq")).as("native"))
      .filter(col("composed") =!= col("native"))
      .count()
    assert(diff === 0L)
  }

  test("null and ragged pairs yield SQL NULL, matching zip_with semantics") {
    val df = Seq(
      (1L, Some(Seq(Some(1.0), Some(2.0))), Some(Seq(Some(3.0), Some(4.0)))), // clean
      (2L, Some(Seq(Some(1.0), None)), Some(Seq(Some(3.0), Some(4.0)))),      // null elem
      (3L, Some(Seq(Some(1.0))), Some(Seq(Some(3.0), Some(4.0)))),            // ragged
      (4L, None, Some(Seq(Some(3.0), Some(4.0))))                             // null array
    ).toDF("id", "a", "b")
    val out = df.select(col("id"),
        Similarity.cosineComposed(col("a"), col("b")).as("composed"),
        Similarity.cosineNative(col("a"), col("b")).as("native"))
      .orderBy(col("id"))
      .as[(Long, Option[Double], Option[Double])]
      .collect()
    assert(out.forall { case (_, c, n) => c == n })
    assert(out.map(_._2.isDefined).toSeq === Seq(true, false, false, false))
  }

  test("zero-norm edge: native yields IEEE NaN where ANSI-composed raises") {
    // The one documented divergence: dot/(0·0) is DIVIDE_BY_ZERO under
    // Spark 4's default ANSI mode for the composed form, but the native
    // kernel computes the raw IEEE result (NaN) — which is also what the
    // DuckDB oracle's double division produces. Real embeddings are
    // nonzero, so catalog queries never reach this edge either way.
    val df = Seq((1L, Seq.empty[Double], Seq.empty[Double])).toDF("id", "a", "b")
    val Array(n) = df.select(Similarity.cosineNative(col("a"), col("b")).as("n"))
      .as[Double].collect()
    assert(n.isNaN)
    val ex = intercept[Exception] {
      df.select(Similarity.cosineComposed(col("a"), col("b")).as("c")).collect()
    }
    assert(ex.getMessage.contains("DIVIDE_BY_ZERO") ||
      Option(ex.getCause).exists(_.getMessage.contains("DIVIDE_BY_ZERO")))
  }
}
