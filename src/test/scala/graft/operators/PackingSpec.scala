package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {
  import spark.implicits._

  private def docs(n: Int) =
    (0 until n).map(i => (i.toLong, 100L + i % 7)).toDF("doc_id", "n_tokens")

  test("offsets are contiguous per shard: each doc starts where the previous ended") {
    val packed = Packing.packChunks(docs(64), "doc_id", "n_tokens", seqLen = 256, nShards = 4)
      .select($"doc_id", $"shard", $"n_tokens", $"tok_offset")
      .as[(Long, Long, Long, Long)].collect()
    packed.groupBy(_._2).values.foreach { shardDocs =>
      val inOrder = shardDocs.sortBy(_._1)
      val expected = inOrder.map(_._3).scanLeft(0L)(_ + _).init
      assert(inOrder.map(_._4).toSeq == expected.toSeq,
        "tok_offset must be the exact running token total within the shard")
    }
  }

  test("chunk is the seqLen window of the doc's first token; shards partition by id") {
    val packed = Packing.packChunks(docs(64), "doc_id", "n_tokens", seqLen = 256, nShards = 4)
      .select($"doc_id", $"shard", $"tok_offset", $"chunk")
      .as[(Long, Long, Long, Long)].collect()
    assert(packed.forall { case (id, shard, off, chunk) =>
      shard == id % 4 && chunk == off / 256
    })
  }

  test("packing is stable under corpus growth: new (higher-id) docs never move old ones") {
    val small = Packing.packChunks(docs(32), "doc_id", "n_tokens", seqLen = 256, nShards = 4)
      .select($"doc_id", $"shard", $"tok_offset", $"chunk")
      .as[(Long, Long, Long, Long)].collect().toSet
    val big = Packing.packChunks(docs(64), "doc_id", "n_tokens", seqLen = 256, nShards = 4)
      .filter($"doc_id" < 32)
      .select($"doc_id", $"shard", $"tok_offset", $"chunk")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(small == big, "appending docs must only extend each shard's tail")
  }

  test("negative ids still land in [0, nShards) via pmod") {
    val neg = Seq((-7L, 10L), (-1L, 10L), (0L, 10L), (5L, 10L))
      .toDF("doc_id", "n_tokens")
    val shards = Packing.packChunks(neg, "doc_id", "n_tokens", seqLen = 256, nShards = 4)
      .select($"doc_id", $"shard").as[(Long, Long)].collect().toMap
    assert(shards.values.forall(s => s >= 0 && s < 4),
      s"every shard must be in range, got $shards")
    assert(shards(-7L) == 1L && shards(-1L) == 3L, "pmod, not sign-preserving %")
  }

  test("one shuffle on the shard key, then in-partition windows") {
    val plan = Packing.packChunks(docs(64), "doc_id", "n_tokens", seqLen = 256, nShards = 4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Window"), "expected a window for the cumsum")
    assert(!plan.contains("SinglePartition"),
      s"cumsum must partition by shard, never collapse to one partition:\n$plan")
  }
}
