package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PartitioningSpec extends SparkSpec {
  import spark.implicits._

  private def skewed = {
    // 90% of rows share one hot key
    val hot = Seq.fill(900)("hot")
    val cold = (1 to 100).map(i => s"k$i")
    (hot ++ cold).zipWithIndex.map { case (k, i) => (k, i.toDouble) }.toDF("k", "v")
  }

  test("salted aggregate equals plain aggregate on skewed keys") {
    val plain = skewed.groupBy($"k")
      .agg(sum($"v").as("sum_v"), count(lit(1)).as("n"))
      .orderBy($"k").collect().toSeq
    val salted = Partitioning.saltedAggregate(skewed, "k", "v")
      .withColumnRenamed("sum_v", "sum_v")
      .orderBy($"k").collect().toSeq
    assert(salted == plain)
  }

  test("salted join equals plain join on skewed keys") {
    val dim = Seq(("hot", "H"), ("k1", "A"), ("k2", "B")).toDF("k", "label")
    val plain = skewed.join(dim, "k").orderBy($"k", $"v").collect().toSeq
    val salted = Partitioning.saltedJoin(skewed, dim, "k")
      .select(skewed.columns.map(col) :+ col("label"): _*)
      .orderBy($"k", $"v").collect().toSeq
    assert(salted == plain)
  }

  test("salted join salt is deterministic across runs (content-derived)") {
    // monotonically_increasing_id would change under retry/recomputation;
    // content-hash salt must reproduce bit-identically run-to-run
    val saltCol = Partitioning.salt(16, skewed.columns.map(col).toIndexedSeq: _*)
    val run1 = skewed.withColumn("s", saltCol).orderBy($"k", $"v").collect().toSeq
    val run2 = skewed.withColumn("s", saltCol).orderBy($"k", $"v").collect().toSeq
    assert(run1 == run2)
    val dim = Seq(("hot", "H"), ("k1", "A")).toDF("k", "label")
    val j1 = Partitioning.saltedJoin(skewed, dim, "k").orderBy($"k", $"v").collect().toSeq
    val j2 = Partitioning.saltedJoin(skewed, dim, "k").orderBy($"k", $"v").collect().toSeq
    assert(j1 == j2)
  }

  test("saltFrom tiebreak spreads a hot key of FULL-DUPLICATE rows") {
    // content salting degenerates when the hot key's rows are identical
    // (identical content → identical salt); a unique tiebreak column
    // restores the spread while staying deterministic
    val dupHot = (1 to 800).map(i => (i.toLong, "hot", 1.0)) ++
      (1 to 50).map(i => (800L + i, s"k$i", i.toDouble))
    val left = dupHot.toDF("event_id", "k", "v")
    val contentSalts = left.drop("event_id")
      .select(Partitioning.salt(16, $"k", $"v")).distinct().count()
    assert(contentSalts <= 51L + 1L) // hot rows collapse to ONE salt
    val spread = left.filter($"k" === "hot")
      .select(Partitioning.salt(16, $"event_id")).distinct().count()
    assert(spread == 16L, s"tiebreak salt should hit all 16 buckets, got $spread")
    val dim = Seq(("hot", "H"), ("k1", "A")).toDF("k", "label")
    val outCols = left.columns.map(col) :+ col("label")
    val plain = left.join(dim, "k")
      .select(outCols: _*).orderBy($"event_id").collect().toSeq
    val salted = Partitioning.saltedJoin(left, dim, "k", saltFrom = Seq("event_id"))
      .select(outCols: _*).orderBy($"event_id").collect().toSeq
    assert(salted == plain)
  }

  test("hive-partitioned write prunes partitions at scan time") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    graft.Graft.table(spark, sf(), "events")
      .withColumn("event_type", $"event_type")
      .write.mode("overwrite").partitionBy("event_type").parquet(dir)
    val pruned = spark.read.parquet(dir).filter($"event_type" === "purchase")
    val plan = pruned.queryExecution.executedPlan.toString
    // partition filter must be applied at file-index level, not post-scan
    assert(plan.contains("PartitionFilters") &&
      plan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
        .contains("event_type"))
    val total = spark.read.parquet(dir).count()
    val prunedCount = pruned.count()
    assert(prunedCount > 0 && prunedCount < total)
  }

  test("dynamic partition pruning injects a runtime partition filter from the dim side") {
    // the 100 TB star-schema scan killer: the fact side is partitioned on
    // the join key, the dim filter is only known at RUNTIME (after the
    // broadcast), and DPP turns it into a partition-level skip on the fact
    // scan — without it the fact side reads every partition and filters
    // post-scan. Spark's broadcast-reuse DPP (on by default) plants a
    // dynamicpruning subquery INSIDE the scan's PartitionFilters.
    val dir = java.nio.file.Files.createTempDirectory("graft-dpp").toString
    graft.Graft.table(spark, sf(), "events")
      .write.mode("overwrite").partitionBy("event_type").parquet(dir)
    val fact = spark.read.parquet(dir)
    // the dim must be a FILE relation: a local Seq dim gets its filter
    // constant-folded into the LocalRelation (ConvertToLocalRelation),
    // leaving no selective predicate for the PartitionPruning rule to see
    val dimDir = java.nio.file.Files.createTempDirectory("graft-dpp-dim").toString
    Seq(("purchase", "rev"), ("view", "eng"), ("click", "eng"),
      ("signup", "acq"), ("error", "ops")).toDF("event_type", "class")
      .write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir)
    val joined = fact.join(dim.filter($"class" === "rev"), "event_type")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"expected a dynamicpruning subquery in the fact scan:\n$plan")
    // pruned result must equal the statically-filtered truth
    assert(joined.count() ==
      fact.filter($"event_type" === "purchase").count())
  }

  test("bucketed-bucketed join plans without a shuffle exchange") {
    val li = graft.Graft.table(spark, sf(), "lineitem")
      .select($"l_orderkey", $"l_quantity")
    val o = graft.Graft.table(spark, sf(), "orders")
      .select($"o_orderkey", $"o_totalprice")
    li.write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("li_bucketed")
    o.write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("o_bucketed")
    // disable auto-broadcast so the join would NEED a shuffle if the
    // bucketing were not honored
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("li_bucketed")
        .join(spark.table("o_bucketed"),
          $"l_orderkey" === $"o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }

  // ---- fanOutNarrowScan (r19 verdict tasks 1 + 7) ----

  test("fanOutNarrowScan rejects non-narrow inputs before probing partitions") {
    val docs = graft.Graft.table(spark, sf(), "documents")
    // aggregates, joins, and explicit repartitions all plan exchanges: the
    // AQE-finalizing df.rdd probe would pre-execute them — must throw
    val agg = docs.groupBy($"lang").count()
    val err = intercept[IllegalArgumentException] {
      Partitioning.fanOutNarrowScan(agg)
    }
    assert(err.getMessage.contains("exchange-free"))
    intercept[IllegalArgumentException] {
      Partitioning.fanOutNarrowScan(docs.join(docs.select($"doc_id"), "doc_id"))
    }
    intercept[IllegalArgumentException] {
      Partitioning.fanOutNarrowScan(docs.repartition(4))
    }
    // scan + narrow projections pass (every shipped call site's shape)
    val ok = Partitioning.fanOutNarrowScan(
      docs.select($"doc_id", $"text").filter($"doc_id" >= 0))
    assert(ok.count() == docs.count())
  }

  test("fanOutNarrowScan byte budget caps the fan-out below the core count on tiny inputs") {
    val docs = graft.Graft.table(spark, sf(), "documents")
      .select($"doc_id", $"text")
    // sf0.001 documents is a few KB: one 64 KB budget partition suffices,
    // so the tiny corpus must NOT fan out to defaultParallelism (the r18
    // behavior the driver measured as a regression on simhash_bands)
    val bytes = docs.queryExecution.optimizedPlan.stats.sizeInBytes
    val expected = ((bytes + 64 * 1024 - 1) / (64 * 1024))
      .min(BigInt(spark.sparkContext.defaultParallelism)).max(BigInt(1)).toInt
    val fanned = Partitioning.fanOutNarrowScan(docs)
    assert(fanned.rdd.getNumPartitions <= math.max(expected, 1),
      s"tiny input fanned to ${fanned.rdd.getNumPartitions} partitions, " +
        s"budget allows $expected")
    // and a large byte estimate still fills the cores: with a 1-byte
    // budget the target is defaultParallelism exactly as in r18
    val full = Partitioning.fanOutNarrowScan(docs, bytesPerTask = 1L)
    assert(full.rdd.getNumPartitions == spark.sparkContext.defaultParallelism)
  }
}
