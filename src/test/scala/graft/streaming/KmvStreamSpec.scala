package graft.streaming

import graft.SparkSpec
import graft.operators.KmvSketch
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Streaming KMV sketch (StatefulOps.kmvDistinct) — the bounded-state
  * running COUNT(DISTINCT) twin of q_agg_kmv_set_ops. The exact-merge
  * property of the bottom-k sketch promises something stronger than the
  * usual streaming-vs-batch "parity of aggregates": the per-key state
  * after ANY trigger split or arrival order is BIT-IDENTICAL to the batch
  * sketch of the same rows. These tests assert that on the emitted sketch
  * ARRAYS, not just the estimates, plus the ≤ k state bound and duplicate
  * absorption (replays cannot change a bottom-k).
  */
class KmvStreamSpec extends SparkSpec {
  import spark.implicits._
  import StatefulOps.{HashedValue, KmvSketchRow}

  private val K = 8

  // two keys; "a" exceeds sketch capacity (20 distinct), "b" stays below
  // it (3 distinct, with duplicates) so the below-capacity exactness path
  // is covered too. Hashes are arbitrary longs, including negatives (the
  // unsigned-compare path) — the processor is value-agnostic by contract.
  private val rows: Seq[HashedValue] =
    (1 to 20).map(i => HashedValue("a", i * 2654435761L)) ++
      Seq(-5L, -5L, 7L, 7L, 42L).map(HashedValue("b", _))

  private def batchTruth(key: String): Seq[Long] =
    KmvSketch.bottomK(K, rows.filter(_.key == key).map(_.h))

  private def run(batches: Seq[Seq[HashedValue]], name: String): Map[String, KmvSketchRow] =
    withRocksDBProvider {
      val in = MemoryStream[HashedValue](spark)
      val q = StatefulOps.kmvDistinct(in.toDS(), K)
        .writeStream.outputMode(OutputMode.Update).format("memory")
        .queryName(name).start()
      batches.foreach { b => in.addData(b); q.processAllAvailable() }
      q.stop()
      // latest emission per key = the final state
      spark.table(name).as[KmvSketchRow].collect().toSeq
        .groupBy(_.key).map { case (k, rs) => k -> rs.maxBy(_.nRows) }
    }

  test("single trigger: sketch arrays are bit-identical to the batch sketch") {
    val got = run(Seq(rows), "kmv_one")
    assert(got("a").sketch == batchTruth("a"))
    assert(got("b").sketch == batchTruth("b"))
    assert(got("a").nRows == 20L && got("b").nRows == 5L)
  }

  test("trigger splits and arrival order cannot change the final sketch") {
    val bySplit = run(rows.grouped(3).toSeq, "kmv_split")
    val reversed = run(rows.reverse.grouped(7).toSeq, "kmv_rev")
    for (k <- Seq("a", "b"); got <- Seq(bySplit, reversed)) {
      assert(got(k).sketch == batchTruth(k),
        s"key $k diverged from the batch sketch")
    }
  }

  test("state stays bounded at k over capacity; exact below it") {
    val got = run(Seq(rows), "kmv_bound")
    assert(got("a").sketch.size == K) // 20 distinct > k=8
    assert(got("b").sketch.size == 3) // below capacity: sketch IS the set
    assert(got("b").est == 3L) // and the estimate is exact
  }

  test("replaying a whole trigger is absorbed (bottom-k is idempotent)") {
    val replayed = run(Seq(rows, rows), "kmv_replay")
    assert(replayed("a").sketch == batchTruth("a"))
    assert(replayed("b").sketch == batchTruth("b"))
    // only nRows (the audit counter) sees the duplicates
    assert(replayed("a").nRows == 40L)
  }
}
