package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Contracts for the layout planners:
  *
  * 1. zValue is a BIJECTION on the grid — interleaving then masking the
  *    even/odd bits back out recovers both coordinates exactly, for
  *    adversarial corner coordinates and a pseudorandom sample. (The
  *    oracle gate proves Spark≡DuckDB on real data; this proves the
  *    Morton math itself.)
  * 2. binPack produces contiguous bins whose totals sit in the tight
  *    first-fit band (target − maxFile, target + maxFile) for every
  *    non-final bin — the invariant that makes the planned output files
  *    uniformly sized, which is the entire point of compaction.
  */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zValue interleave is exactly invertible on the 10-bit grid") {
    val corner = Seq((0L, 0L), (1023L, 1023L), (0L, 1023L), (1023L, 0L),
      (512L, 511L), (341L, 682L))
    val rnd = (1 to 200).map { i =>
      ((i * 2654435761L >>> 7) % 1024, (i * 40503L >>> 3) % 1024)
    }
    val df = (corner ++ rnd).toDF("a", "b")
      .withColumn("z", Layout.zValue(col("a"), col("b"), 10))
    val rows = df.collect()
    rows.foreach { r =>
      val (a, b, z) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val backA = (0 until 10).map(i => ((z >> (2 * i)) & 1L) << i).sum
      val backB = (0 until 10).map(i => ((z >> (2 * i + 1)) & 1L) << i).sum
      assert(backA == a && backB == b, s"z=$z did not invert to ($a,$b)")
      assert(z >= 0 && z < (1L << 20))
    }
    // distinct inputs → distinct codes (injectivity on the sample)
    assert(rows.map(_.getLong(2)).distinct.length ==
      rows.map(r => (r.getLong(0), r.getLong(1))).distinct.length)
  }

  test("hilbertIndex matches the reference xy2d recurrence on the full 32x32 grid") {
    // single-threaded reference: the standard iterative Hilbert xy->d
    def ref(order: Int, x0: Long, y0: Long): Long = {
      var (x, y, d) = (x0, y0, 0L)
      var s = 1L << (order - 1)
      while (s > 0) {
        val rx = if ((x & s) != 0) 1L else 0L
        val ry = if ((y & s) != 0) 1L else 0L
        d += s * s * ((3 * rx) ^ ry)
        if (ry == 0) {
          if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
          val t = x; x = y; y = t
        }
        s >>= 1
      }
      d
    }
    val grid = for (x <- 0L until 32L; y <- 0L until 32L) yield (x, y)
    val got = Layout.hilbertIndex(grid.toDF("x", "y"), "x", "y", order = 5)
      .select($"x", $"y", $"h").as[(Long, Long, Long)].collect()
    assert(got.length == 1024)
    got.foreach { case (x, y, h) =>
      assert(h == ref(5, x, y), s"($x,$y): got $h, ref ${ref(5, x, y)}")
    }
    // the native codegen kernel is bit-identical to the composed form
    val nat = Layout.hilbertIndex(grid.toDF("x", "y"), "x", "y", order = 5)
      .withColumn("hn",
        graft.functions.HilbertIndexExpression.column($"x", $"y", order = 5))
    assert(nat.filter($"h" =!= $"hn").count() == 0,
      "HilbertIndexExpression diverged from the composed form")
    // the curve is a bijection onto 0..1023 ...
    assert(got.map(_._3).sorted.toSeq == (0L until 1024L))
    // ... and consecutive curve positions are always grid-adjacent — the
    // locality property Morton lacks and the reason hilbert cells have
    // tighter envelopes
    val byH = got.map { case (x, y, h) => h -> ((x, y)) }.toMap
    (0L until 1023L).foreach { h =>
      val (x1, y1) = byH(h); val (x2, y2) = byH(h + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"positions $h and ${h + 1} are not grid-adjacent")
    }
  }

  test("binPack bins are contiguous and sized within the first-fit band") {
    val target = 100L
    // file sizes 1..37 cycled — max 37, total 3800 → ~38 bins
    val manifest = (1 to 200).map(i => (f"f$i%04d", (i % 37 + 1).toLong))
      .toDF("f", "n")
    val planned = manifest
      .withColumn("bin", Layout.binPack(col("n"), col("f"), target))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val maxFile = planned.map(_._2).max
    // contiguity: bin ids are non-decreasing in manifest order, no gaps
    val bins = planned.map(_._3)
    assert(bins.zip(bins.tail).forall { case (x, y) => y == x || y == x + 1 },
      "bin ids must be non-decreasing without gaps in manifest order")
    val totals = planned.groupBy(_._3).view.mapValues(_.map(_._2).sum).toMap
    val last = bins.max
    totals.filter(_._1 != last).foreach { case (b, tot) =>
      assert(tot > target - maxFile && tot < target + maxFile,
        s"bin $b total $tot outside (${target - maxFile}, ${target + maxFile})")
    }
    assert(totals.values.sum == planned.map(_._2).sum)
  }
}
