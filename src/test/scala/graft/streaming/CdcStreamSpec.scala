package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Streaming changelog compaction (StreamOps.cdcSnapshot) — the incremental
  * twin of the batch q_win_cdc_apply: per-key latest-wins with delete
  * tombstones, state bounded at one record per live key. The arrival-order
  * property is the point: the same change set, split into different
  * triggers in different orders, must converge to the same snapshot.
  */
class CdcStreamSpec extends SparkSpec {
  import spark.implicits._
  import StreamOps.{CdcChange, CdcSnapshotRow}

  private def runChanges(batches: Seq[Seq[CdcChange]], name: String): Map[Long, CdcSnapshotRow] = {
    val in = MemoryStream[CdcChange](spark)
    val q = StreamOps.cdcSnapshot(in.toDS())
      .writeStream.outputMode(OutputMode.Update).format("memory")
      .queryName(name).start()
    batches.foreach { b => in.addData(b); q.processAllAvailable() }
    q.stop()
    // update mode emits one row per key per touched trigger: latest wins
    spark.table(name).as[CdcSnapshotRow].collect()
      .groupBy(_.key).map { case (k, rs) => k -> rs.maxBy(r => (r.lastTsUs, r.deleted)) }
  }

  private val changes = Seq(
    CdcChange(1L, 100L, 1L, "U", "view", 500L),
    CdcChange(1L, 300L, 4L, "U", "click", 700L),   // final winner for key 1
    CdcChange(1L, 200L, 2L, "U", "purchase", 900L),
    CdcChange(2L, 100L, 3L, "U", "view", 100L),
    CdcChange(2L, 400L, 5L, "D", "error", 0L),     // key 2 ends deleted
    CdcChange(3L, 50L, 6L, "U", "signup", 250L))

  test("latest-wins snapshot with tombstones, invariant to arrival order") {
    val a = runChanges(Seq(changes.take(2), changes.drop(2)), "cdc_a")
    // same changes, reversed and split differently: stale updates arrive AFTER newer ones
    val b = runChanges(changes.reverse.grouped(2).toSeq, "cdc_b")
    for (got <- Seq(a, b)) {
      assert(got(1L) == CdcSnapshotRow(1L, "click", 700L, 300L, deleted = false))
      assert(got(2L).deleted, s"key 2 must end tombstoned: ${got(2L)}")
      assert(got(3L) == CdcSnapshotRow(3L, "signup", 250L, 50L, deleted = false))
    }
    assert(a == b, "snapshot must be arrival-order invariant")
  }

  test("state survives across triggers: stale late change never regresses the snapshot") {
    val in = MemoryStream[CdcChange](spark)
    val q = StreamOps.cdcSnapshot(in.toDS())
      .writeStream.outputMode(OutputMode.Update).format("memory")
      .queryName("cdc_late").start()
    in.addData(CdcChange(7L, 900L, 10L, "U", "click", 111L))
    q.processAllAvailable()
    in.addData(CdcChange(7L, 100L, 11L, "U", "view", 999L)) // stale
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("cdc_late").as[CdcSnapshotRow].collect()
    // the stale change re-emits the UNCHANGED winning state
    assert(rows.forall(r => r.lastType == "click" && r.lastCents == 111L && r.lastTsUs == 900L))
  }
}
