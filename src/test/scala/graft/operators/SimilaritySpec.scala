package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def vecs = Seq(
    (1L, Seq(1.0, 0.0, 0.0, 0.0)),
    (2L, Seq(0.9, 0.1, 0.0, 0.0)),  // near 1
    (3L, Seq(0.0, 1.0, 0.0, 0.0)),  // orthogonal to 1
    (4L, Seq(-1.0, 0.0, 0.0, 0.0))  // opposite of 1
  ).toDF("id", "vec")

  test("cosine: identity, orthogonality, opposition") {
    val df = vecs.as("x").join(vecs.as("y"), col("x.id") <= col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"),
        Similarity.cosine(col("x.vec"), col("y.vec")).as("c"))
    val m = df.as[(Long, Long, Double)].collect().map { case (a, b, c) => (a, b) -> c }.toMap
    assert(math.abs(m((1L, 1L)) - 1.0) < 1e-12)
    assert(math.abs(m((1L, 3L))) < 1e-12)
    assert(math.abs(m((1L, 4L)) + 1.0) < 1e-12)
    assert(m((1L, 2L)) > 0.99)
  }

  test("brute-force top-k ranks the planted neighbor first") {
    val top = Similarity.bruteForceTopK(vecs.filter($"id" === 1), vecs, k = 2)
      .select($"rank", $"cid").as[(Long, Long)].collect().toSeq.sorted
    assert(top == Seq((1L, 2L), (2L, 3L)))
  }

  test("sign bucket groups sign-identical vectors; bucketed top-k finds same-bucket neighbor") {
    val b = vecs.select($"id", Similarity.signBucket($"vec", 4).as("b")).as[(Long, Long)].collect().toMap
    assert(b(1L) == b(2L))   // same sign pattern
    assert(b(1L) != b(4L))   // sign flip on dim 1
    val top = Similarity.bucketedTopK(vecs.filter($"id" === 1), vecs, k = 1, nbits = 4)
      .select($"cid").as[Long].collect().toSeq
    assert(top == Seq(2L))
  }

  test("multi-table LSH recall beats single-table bucketing on real embeddings") {
    val emb = spark.read.parquet(s"${sf("sf0.001")}/embeddings.parquet")
      .select($"vec_id".as("id"), Similarity.toDouble($"embedding").as("vec"))
    val q = emb.filter($"id" < 20)
    val bf = Similarity.bruteForceTopK(q, emb, 3)
      .select($"qid", $"cid").as[(Long, Long)].collect().toSet
    val lsh = Similarity.lshTopK(q, emb, 3, dims = 64)
      .select($"qid", $"cid").as[(Long, Long)].collect().toSet
    val single = Similarity.bucketedTopK(q, emb, 3, nbits = 4)
      .select($"qid", $"cid").as[(Long, Long)].collect().toSet
    val lshRecall = (bf & lsh).size.toDouble / bf.size
    val singleRecall = (bf & single).size.toDouble / bf.size
    info(f"LSH(8x4) recall=$lshRecall%.2f vs single-table=$singleRecall%.2f")
    assert(lshRecall >= singleRecall)
    assert(lshRecall >= 0.4) // theory ~0.75 at cos≈0.4; generous floor
  }

  // The two LSH queries ship EXACT SQL as their oracle (all-pairs /
  // brute-force), so approximate==exact must hold on the driver's inputs.
  // The probability argument alone is dataset-dependent (a rank-3 neighbor
  // at cosine ~0 misses a 2-bit table with p=3/4, i.e. ~3e-3 over 20
  // tables; negative-cosine neighbors miss more often) — so the gate runs
  // on EVERY testdata scale factor the driver can evaluate at, not just
  // sf0.001. Equality on the actual driver inputs, not the estimate, is
  // what licenses the exact oracle; on any NEW dataset these gates must be
  // re-run before trusting the oracle pairing.
  private val driverSfs = Seq("sf0.001", "sf0.01", "sf0.1")
    .filter(d => new java.io.File(s"${sf(d)}/embeddings.parquet").exists())

  test("LSH near-dup pairs EQUAL the exact all-pairs result at EVERY driver sf (recall 1.0 gate)") {
    // q_sim_near_dup_lsh ships the all-pairs SQL as its oracle, so this
    // equality must hold exactly — any missed pair here means a driver-red
    // row; fix by raising nTables / lowering nbits before shipping.
    assert(driverSfs.nonEmpty)
    for (d <- driverSfs) {
      val emb = spark.read.parquet(s"${sf(d)}/embeddings.parquet")
        .select($"vec_id", Similarity.toDouble($"embedding").as("v"))
      val allPairs = emb.as("x").join(emb.as("y"), col("x.vec_id") < col("y.vec_id"))
        .withColumn("sim", Similarity.cosine(col("x.v"), col("y.v")))
        .filter($"sim" >= 0.4)
        .select(col("x.vec_id").as("a"), col("y.vec_id").as("b"), $"sim")
        .as[(Long, Long, Double)].collect().toSet
      val lsh = Similarity.lshNearDupPairs(emb, threshold = 0.4, dims = 64)
        .as[(Long, Long, Double)].collect().toSet
      assert(lsh == allPairs,
        s"[$d] missed=${(allPairs -- lsh).map(p => (p._1, p._2))} extra=${(lsh -- allPairs).map(p => (p._1, p._2))}")
      assert(allPairs.nonEmpty, s"[$d] vacuous gate")
    }
  }

  test("LSH top-k at oracle params (nbits=2 x 20 tables) EQUALS brute force at EVERY driver sf (recall 1.0 gate)") {
    // q_sim_lsh_topk ships the brute-force SQL as its oracle, so rank-level
    // equality must hold exactly at these parameters — any missed neighbor
    // shifts a rank and means a driver-red row; fix by raising nTables /
    // lowering nbits before shipping.
    assert(driverSfs.nonEmpty)
    for (d <- driverSfs) {
      val emb = spark.read.parquet(s"${sf(d)}/embeddings.parquet")
        .select($"vec_id".as("id"), Similarity.toDouble($"embedding").as("vec"))
      val q = emb.filter($"id" < 20)
      val bf = Similarity.bruteForceTopK(q, emb, 3)
        .select($"qid", $"rank", $"cid").as[(Long, Long, Long)].collect().toSet
      val lsh = Similarity.lshTopK(q, emb, 3, dims = 64, nbits = 2, nTables = 20)
        .select($"qid", $"rank", $"cid").as[(Long, Long, Long)].collect().toSet
      assert(lsh == bf, s"[$d] missed=${bf -- lsh} extra=${lsh -- bf}")
      assert(bf.size == 60, s"[$d] vacuous gate")
    }
  }

  test("int8 quantization: golden codes, zero vector, and top-k agreement with float") {
    val df = Seq((1L, Seq(0.5, -1.0, 0.25)), (2L, Seq(0.0, 0.0, 0.0)))
      .toDF("id", "vec")
      .withColumn("ma", Similarity.maxAbs($"vec"))
    val codes = df.select($"id", Similarity.quantize($"vec", $"ma").as("q"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(codes(1L) == Seq(64L, -127L, 32L)) // floor(x*127/max|x| + 0.5)
    assert(codes(2L) == Seq(0L, 0L, 0L))      // zero vector stays zero
    // int8 ranking tracks the float ranking on real embeddings
    val emb = spark.read.parquet(s"${sf("sf0.001")}/embeddings.parquet")
      .select($"vec_id".as("id"), Similarity.toDouble($"embedding").as("vec"))
    val q = emb.filter($"id" < 20)
    val bf = Similarity.bruteForceTopK(q, emb, 3)
      .select($"qid", $"cid").as[(Long, Long)].collect().toSet
    val qz = Similarity.quantizedTopK(q, emb, 3)
      .select($"qid", $"cid").as[(Long, Long)].collect().toSet
    val recall = (bf & qz).size.toDouble / bf.size
    info(f"int8 top-3 recall vs float: $recall%.2f")
    assert(recall >= 0.8, s"int8 ranking diverged too far from float (recall $recall)")
  }

  test("bucketed recall vs brute force on real embeddings (top-1, 20 queries)") {
    val emb = spark.read.parquet(s"${sf("sf0.001")}/embeddings.parquet")
      .select($"vec_id".as("id"), Similarity.toDouble($"embedding").as("vec"))
    val q = emb.filter($"id" < 20)
    val bf = Similarity.bruteForceTopK(q, emb, 1).select($"qid", $"cid").as[(Long, Long)].collect().toMap
    val iv = Similarity.bucketedTopK(q, emb, 1, nbits = 4).select($"qid", $"cid").as[(Long, Long)].collect().toMap
    val agree = bf.count { case (k, v) => iv.get(k).contains(v) }
    // Random 64-dim embeddings: 4 sign bits keep ~1/16 of the corpus per
    // bucket; exact-match recall is data-dependent — just require the
    // approximate path returns something for every query and overlaps at all.
    assert(iv.size == 20)
    assert(agree >= 1)
  }

  test("hard negatives exclude the query's own label and rank the near-miss first") {
    val labeled = Seq(
      (1L, Seq(1.0, 0.0, 0.0, 0.0), 0),
      (2L, Seq(0.9, 0.1, 0.0, 0.0), 0),   // same label as 1: must never appear
      (3L, Seq(0.8, 0.2, 0.0, 0.0), 1),   // the hard negative: near, other label
      (4L, Seq(0.0, 1.0, 0.0, 0.0), 1),
      (5L, Seq(-1.0, 0.0, 0.0, 0.0), 2)
    ).toDF("id", "vec", "label")
    val got = Similarity.hardNegatives(labeled.filter($"id" === 1), labeled, k = 3)
      .select($"rank", $"cid", $"clabel").as[(Long, Long, Int)].collect().toSeq.sortBy(_._1)
    assert(got.map(_._2) == Seq(3L, 4L, 5L)) // near-miss first, antipode last
    assert(!got.exists(_._3 == 0))           // own label filtered out
  }

  test("hard negatives on a single-label corpus are empty") {
    val one = Seq((1L, Seq(1.0, 0.0), 7), (2L, Seq(0.0, 1.0), 7)).toDF("id", "vec", "label")
    assert(Similarity.hardNegatives(one, one, k = 5).isEmpty)
  }
}
