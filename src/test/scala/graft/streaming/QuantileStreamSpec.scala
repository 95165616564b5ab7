package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Streaming GK quantiles (StatefulOps.runningQuantiles) — the rank member
  * of the streaming sketch family. Unlike the KMV/CMS twins there is no
  * byte-level batch parity to assert (a GK summary's structure depends on
  * insertion/compression order); the honest guarantee is the rank
  * envelope: every emitted percentile's TRUE rank among the values seen
  * must lie within φ·n ± ε·n. The spec computes true ranks from the sorted
  * data and asserts that envelope for every split shape, plus state
  * carry-over (final count sees every trigger) and per-key isolation.
  */
class QuantileStreamSpec extends SparkSpec {
  import spark.implicits._
  import StatefulOps.{Observation, QuantileRow}

  private val Eps = 0.01

  // deterministic shuffle of 1..1000 for key "a" (golden-ratio hop over a
  // prime-sized ring); key "b" is a small skewed set
  private val aVals: Seq[Double] =
    (1 to 1000).map(i => ((i * 618L) % 1009L).toDouble).filter(v => v >= 1 && v <= 1000)
  private val rows: Seq[Observation] =
    aVals.map(Observation("a", _)) ++ Seq(1.0, 1.0, 1.0, 50.0, 99.0).map(Observation("b", _))

  private def run(batches: Seq[Seq[Observation]], name: String): Map[String, QuantileRow] =
    withRocksDBProvider {
      val in = MemoryStream[Observation](spark)
      val q = StatefulOps.runningQuantiles(in.toDS(), Eps)
        .writeStream.outputMode(OutputMode.Update).format("memory")
        .queryName(name).start()
      batches.foreach { b => in.addData(b); q.processAllAvailable() }
      q.stop()
      spark.table(name).as[QuantileRow].collect().toSeq
        .groupBy(_.key).map { case (k, rs) => k -> rs.maxBy(_.nRows) }
    }

  /** True rank of `v` (count of values ≤ v) among key "a"'s data. */
  private def rankA(v: Double): Long = aVals.count(_ <= v).toLong

  private def assertEnvelope(row: QuantileRow): Unit = {
    val n = aVals.size.toLong
    assert(row.nRows == n)
    val tol = math.ceil(Eps * n).toLong + 1 // +1 absorbs the ≤-vs-< rank convention
    for ((phi, got) <- Seq(0.5 -> row.p50, 0.95 -> row.p95, 0.99 -> row.p99)) {
      val want = (phi * n).toLong
      assert(math.abs(rankA(got) - want) <= tol,
        s"phi=$phi: value $got has true rank ${rankA(got)}, " +
          s"outside $want ± $tol over $n rows")
    }
  }

  test("single trigger: every percentile is inside the rank envelope") {
    assertEnvelope(run(Seq(rows), "gk_one")("a"))
  }

  test("state carries across triggers and keeps the envelope") {
    assertEnvelope(run(rows.grouped(37).toSeq, "gk_split")("a"))
    assertEnvelope(run(rows.reverse.grouped(101).toSeq, "gk_rev")("a"))
  }

  test("keys are isolated: the small key's percentiles are its own") {
    val b = run(rows.grouped(50).toSeq, "gk_iso")("b")
    assert(b.nRows == 5L)
    assert(b.p50 == 1.0) // 3 of 5 values are 1.0
    assert(b.p99 == 99.0)
  }
}
