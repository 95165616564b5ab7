package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def docs = spark.read.parquet(s"${sf("sf0.001")}/documents.parquet")

  test("hexThreshold: endpoints and monotonicity") {
    assert(Sampling.hexThreshold(0.0) == "00000000")
    assert(Sampling.hexThreshold(1.0) == "g")   // above every hex string
    assert(Sampling.hexThreshold(0.5) == "80000000")
    val ts = Seq(0.1, 0.2, 0.5, 0.9).map(Sampling.hexThreshold)
    assert(ts == ts.sorted)
    // fractions within 2^-33 of 1 round to 2^32: without the clamp this
    // formats as 9-char "100000000", which lexicographically keeps only
    // ~6% of keys instead of ~100%
    assert(Sampling.hexThreshold(1.0 - 1e-12) == "g")
    assert(Sampling.hexThreshold(math.nextDown(1.0)) == "g")
    // largest representable sub-clamp threshold still formats as 8 hex chars
    assert(Sampling.hexThreshold(1.0 - 1e-9).length == 8)
  }

  test("bernoulli at fraction just below 1 keeps everything (threshold clamp)") {
    val kept = Sampling.bernoulli(docs, "doc_id", 1.0 - 1e-12).count()
    assert(kept == docs.count(), "a ~1.0 fraction must not silently drop 94% of rows")
    // split with an extreme weight ratio exercises the same clamp via cum ≈ 1
    val w = Seq("train" -> (1.0 - 1e-13), "rest" -> 1e-13)
    val labels = Sampling.split(docs, "doc_id", w)
      .groupBy($"split").count().as[(String, Long)].collect().toMap
    assert(labels.getOrElse("train", 0L) == docs.count(),
      s"cum within 2^-33 of 1 must clamp to keep-everything, got $labels")
  }

  test("bernoulli keeps ~fraction, deterministically across runs") {
    val n = docs.count().toDouble
    val s1 = Sampling.bernoulli(docs, "doc_id", 0.3).select($"doc_id").as[Long].collect().toSet
    val s2 = Sampling.bernoulli(docs, "doc_id", 0.3).select($"doc_id").as[Long].collect().toSet
    assert(s1 == s2, "same data + same salt must select the same rows")
    assert(math.abs(s1.size / n - 0.3) < 0.08, s"kept ${s1.size}/$n, expected ~30%")
  }

  test("split is disjoint, exhaustive, and stable as the dataset grows") {
    val w = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val full = Sampling.split(docs, "doc_id", w)
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    assert(full.size == docs.count(), "every row gets exactly one label")
    val frac = full.values.groupBy(identity).view.mapValues(_.size / full.size.toDouble)
    assert(math.abs(frac("train") - 0.8) < 0.1)
    // growth stability: splitting only HALF the corpus assigns every shared
    // id the same label — rand()/row_number() schemes both fail this
    val half = Sampling.split(docs.filter($"doc_id" % 2 === 0), "doc_id", w)
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    assert(half.forall { case (id, s) => full(id) == s },
      "an existing row must never move between splits when rows are added")
  }

  test("stratified: changing one stratum's rate never reshuffles another stratum") {
    val a = Sampling.stratified(docs, "lang", "doc_id", Map("en" -> 0.5), default = 0.2)
      .filter($"lang" =!= "en").select($"doc_id").as[Long].collect().toSet
    val b = Sampling.stratified(docs, "lang", "doc_id", Map("en" -> 0.9), default = 0.2)
      .filter($"lang" =!= "en").select($"doc_id").as[Long].collect().toSet
    assert(a == b, "non-en strata must be unaffected by the en rate")
    val keepAll = Sampling.stratified(docs, "lang", "doc_id", Map("zh" -> 1.0), default = 0.0)
    assert(keepAll.count() == docs.filter($"lang" === "zh").count())
  }

  test("bernoulli is a pure map-side filter: no shuffle in the plan") {
    val plan = Sampling.bernoulli(docs, "doc_id", 0.2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"sampling must not shuffle:\n$plan")
  }

  test("epoch shuffle: reproducible within an epoch, different across epochs") {
    def order(epoch: Int) = Sampling.epochShuffle(docs, "doc_id", epoch)
      .select($"doc_id").as[Long].collect().toSeq
    assert(order(1) == order(1), "same epoch must replay the same permutation")
    assert(order(1) != order(2), "different epochs must permute differently")
    assert(order(1).toSet == order(2).toSet, "a shuffle reorders, never drops")
  }

  test("exact-k per stratum: k rows each, reproducible, minimal churn on growth") {
    val s1 = Sampling.exactKPerStratum(docs, "lang", "doc_id", k = 5)
      .select($"lang", $"doc_id").as[(String, Long)].collect()
    assert(s1.groupBy(_._1).values.forall(_.length == 5), "exactly k per stratum")
    val s2 = Sampling.exactKPerStratum(docs, "lang", "doc_id", k = 5)
      .select($"lang", $"doc_id").as[(String, Long)].collect()
    assert(s1.toSet == s2.toSet, "reruns pick the same rows")
    // shrinking the corpus keeps every surviving member that is still there
    val shrunk = Sampling.exactKPerStratum(docs.filter($"doc_id" % 3 =!= 0),
      "lang", "doc_id", k = 5).select($"doc_id").as[Long].collect().toSet
    val survivors = s1.map(_._2).filter(_ % 3 != 0).toSet
    assert(survivors.subsetOf(shrunk),
      "members not removed from the corpus must stay selected (hash order is stable)")
  }

  test("weighted sampling: clamps at both ends, scales with weight, deterministic") {
    val rows = (0L until 400L).map(i => (i, (i % 4) match {
      case 0 => 0.0    // rate·w = 0 → never kept
      case 1 => 0.5
      case 2 => 2.0
      case 3 => 100.0  // rate·w ≥ 1 → always kept
    }))
    val df = rows.toDF("doc_id", "w")
    val kept = Sampling.weighted(df, "doc_id", "w", rate = 0.2)
      .as[(Long, Double)].collect().map(_._1).toSet
    assert(rows.filter(_._2 == 0.0).forall(r => !kept.contains(r._1)), "zero weight kept")
    assert(rows.filter(_._2 == 100.0).forall(r => kept.contains(r._1)), "clamped weight dropped")
    val midLow = rows.count(r => r._2 == 0.5 && kept.contains(r._1))
    val midHigh = rows.count(r => r._2 == 2.0 && kept.contains(r._1))
    // p = 0.1 vs 0.4 over 100 draws each — higher weight must keep more
    assert(midLow < midHigh, s"p=0.1 kept $midLow, p=0.4 kept $midHigh")
    val again = Sampling.weighted(df, "doc_id", "w", rate = 0.2)
      .as[(Long, Double)].collect().map(_._1).toSet
    assert(again == kept, "weighted draw must be reproducible")
  }

  test("bernoulli sampling works unchanged on a stream (stateless map-side filter)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val in = MemoryStream[Long](spark)
    val sampled = Sampling.bernoulli(in.toDF().toDF("doc_id"), "doc_id", 0.3)
    val q = sampled.writeStream.format("memory").queryName("stream_sample").start()
    in.addData(0L until 200L: _*)
    q.processAllAvailable()
    val streamed = spark.table("stream_sample").as[Long].collect().toSet
    q.stop()
    val batch = Sampling.bernoulli(
      spark.range(200).toDF("doc_id"), "doc_id", 0.3).as[Long].collect().toSet
    assert(streamed == batch, "stream and batch must select identical rows")
    assert(batch.nonEmpty && batch.size < 200)
  }

  test("systematic keeps the input schema and survives draw/bucket/rn input columns") {
    // r10 ADVICE: the helper columns used to overwrite same-named inputs
    // and leak into the output; now internals are __sys_-prefixed and
    // dropped, so output schema == input schema and user columns survive
    val df = spark.range(100).toDF("doc_id")
      .withColumn("draw", $"doc_id" * 2)
      .withColumn("bucket", $"doc_id" * 3)
      .withColumn("rn", $"doc_id" * 5)
    val got = Sampling.systematic(df, "doc_id", k = 4)
    assert(got.columns.toSeq == Seq("doc_id", "draw", "bucket", "rn"))
    val rows = got.collect()
    assert(rows.nonEmpty && rows.length < 100)
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) == id * 2 && r.getLong(2) == id * 3 && r.getLong(3) == id * 5,
        s"user columns must pass through untouched: $r")
    }
  }

  test("salt decorrelates draws") {
    val x = Sampling.bernoulli(docs, "doc_id", 0.5, salt = "a")
      .select($"doc_id").as[Long].collect().toSet
    val y = Sampling.bernoulli(docs, "doc_id", 0.5, salt = "b")
      .select($"doc_id").as[Long].collect().toSet
    assert(x != y, "different salts should draw different samples")
    // independence: overlap ≈ 25% of corpus, loosely bounded
    val n = docs.count().toDouble
    val overlap = (x & y).size / n
    assert(overlap > 0.1 && overlap < 0.45, s"overlap $overlap outside independence band")
  }
}
