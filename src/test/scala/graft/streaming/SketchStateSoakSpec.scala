package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Bounded-state proof for the streaming sketch trio, on REAL state-store
  * metrics rather than scaladoc claims: the whole point of sketching a
  * running aggregate is that per-key state is CONSTANT in data volume —
  * state rows must scale with the number of KEYS, never with the number of
  * observations folded. The spec pours 50× more data into the same key set
  * and asserts the store's row count does not move, then adds fresh keys
  * and asserts it grows by exactly the per-key state-variable count.
  */
class SketchStateSoakSpec extends SparkSpec {
  import spark.implicits._
  import StatefulOps.HashedValue

  private def withRocksDBProvider[T](body: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally prev match {
      case Some(p) => spark.conf.set(key, p)
      case None    => spark.conf.unset(key)
    }
  }

  test("KMV state rows track keys, not rows folded") {
    withRocksDBProvider {
      val in = MemoryStream[HashedValue](spark)
      val q = StatefulOps.kmvDistinct(in.toDS(), k = 32)
        .writeStream.outputMode(OutputMode.Update).format("memory")
        .queryName("kmv_soak").start()
      def stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      val keys = (0 until 20).map(i => s"k$i")

      // batch 1: 20 keys × 100 rows
      in.addData(for (k <- keys; i <- 1 to 100) yield HashedValue(k, i * 7919L))
      q.processAllAvailable()
      val afterFirst = stateRows
      assert(afterFirst > 0)

      // batch 2: 50× more data, SAME keys — state must not move at all
      (1 to 5).foreach { r =>
        in.addData(for (k <- keys; i <- 1 to 1000) yield HashedValue(k, (r * 100000L + i) * 31L))
        q.processAllAvailable()
      }
      assert(stateRows == afterFirst,
        s"state grew with data volume: $afterFirst -> $stateRows")

      // batch 3: 5 fresh keys — state grows by exactly the per-key rate
      val perKey = afterFirst / keys.size
      in.addData((0 until 5).map(i => HashedValue(s"fresh$i", i * 13L)): _*)
      q.processAllAvailable()
      assert(stateRows == afterFirst + 5 * perKey,
        s"expected ${afterFirst + 5 * perKey} rows after 5 fresh keys, got $stateRows")
      q.stop()
    }
  }

  test("GK quantile state rows also stay flat under 50x data on fixed keys") {
    withRocksDBProvider {
      val in = MemoryStream[StatefulOps.Observation](spark)
      val q = StatefulOps.runningQuantiles(in.toDS(), relativeError = 0.05)
        .writeStream.outputMode(OutputMode.Update).format("memory")
        .queryName("gk_soak").start()
      def stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      val keys = (0 until 10).map(i => s"k$i")
      in.addData(for (k <- keys; i <- 1 to 100) yield StatefulOps.Observation(k, i.toDouble))
      q.processAllAvailable()
      val afterFirst = stateRows
      (1 to 5).foreach { r =>
        in.addData(for (k <- keys; i <- 1 to 1000)
          yield StatefulOps.Observation(k, (r * 1000 + i).toDouble))
        q.processAllAvailable()
      }
      // one ValueState row per key holds the whole GK summary — the row
      // COUNT is exactly flat (the summary blob inside grows only
      // logarithmically, which the store metric does not count)
      assert(stateRows == afterFirst,
        s"state rows grew with data volume: $afterFirst -> $stateRows")
      q.stop()
    }
  }
}
