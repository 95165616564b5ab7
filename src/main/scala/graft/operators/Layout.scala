package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout optimization primitives — the lakehouse OPTIMIZE toolbox
  * (Delta/Iceberg compaction + multi-dimensional clustering), stated as
  * exact integer Column arithmetic so every planner decision sits under
  * the DuckDB oracle gate.
  *
  * Why this belongs in a 100 TB engine: scan cost there is dominated by
  * which FILES a query can skip, not by row throughput. File-level min/max
  * stats (parquet footers) prune only along the physical sort order;
  * z-order interleaving bounds the per-file envelope in EVERY clustered
  * dimension at once, turning point/range predicates on any of them into
  * file skips. The math below is the layout planner's; the shuffle that
  * applies it is one `repartitionByRange(z)` pass.
  */
object Layout {

  /** Morton (z-order) interleave of two `bits`-wide non-negative grid
    * coordinates: bit i of `a` lands at z-bit 2i, bit i of `b` at 2i+1.
    * A chain of 2·bits shift/mask/add terms — pure codegen'd integer ops,
    * map-side, no UDF. Callers normalize raw values onto the grid first
    * (fixed-width division / ranking), exactly like production z-order
    * writers map column values to a bounded rank before interleaving.
    */
  def zValue(a: Column, b: Column, bits: Int): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _).cast("long")

  /** Hilbert-curve index of two `order`-bit non-negative grid coordinates
    * (Hilbert 1891; the xy→d form of the standard iterative conversion) —
    * the space-filling curve production clustering engines prefer over
    * Morton at high orders because consecutive curve positions are always
    * grid-adjacent (no Morton "seams"), which tightens per-file min/max
    * envelopes further. Each of the `order` steps is one quadrant
    * classification (rx/ry bit tests), a d-contribution of
    * s²·(3·rx XOR ry), and the standard reflect+swap rotation — all exact
    * BIGINT when/mask/add terms appended as real projection columns
    * (`hx`/`hy`/`h`), so the expression tree stays LINEAR in `order`
    * instead of the 3^order blow-up of inlining each step into the next.
    * Pure map-side codegen'd arithmetic: at 100 TB the curve value costs
    * one projection pass, and the layout that applies it is a single
    * `repartitionByRange(h)` — identical deployment shape to [[zValue]].
    */
  def hilbertIndex(df: DataFrame, xCol: String, yCol: String, order: Int,
      out: String = "h"): DataFrame = {
    var cur = df
      .withColumn("hx", col(xCol).cast("long"))
      .withColumn("hy", col(yCol).cast("long"))
      .withColumn(out, lit(0L))
    var s = 1L << (order - 1)
    while (s > 0) {
      cur = cur
        .withColumn("rx",
          when(col("hx").bitwiseAND(lit(s)) =!= 0L, lit(1L)).otherwise(lit(0L)))
        .withColumn("ry",
          when(col("hy").bitwiseAND(lit(s)) =!= 0L, lit(1L)).otherwise(lit(0L)))
        .withColumn(out,
          col(out) + lit(s * s) * (lit(3L) * col("rx")).bitwiseXOR(col("ry")))
        .withColumn("nx",
          when(col("ry") === 0L,
            when(col("rx") === 1L, lit(s - 1) - col("hy")).otherwise(col("hy")))
            .otherwise(col("hx")))
        .withColumn("ny",
          when(col("ry") === 0L,
            when(col("rx") === 1L, lit(s - 1) - col("hx")).otherwise(col("hx")))
            .otherwise(col("hy")))
        .withColumn("hx", col("nx"))
        .withColumn("hy", col("ny"))
        .drop("rx", "ry", "nx", "ny")
      s >>= 1
    }
    cur.drop("hx", "hy")
  }

  /** Streaming first-fit compaction bin assignment over an ALREADY
    * AGGREGATED file manifest ordered by `orderCol`: a file whose
    * exclusive size prefix-sum is `cum` goes to bin `cum div target`.
    * Greedy sequential packing — bins fill to ≥ target in manifest order,
    * the plan every compaction service (Delta OPTIMIZE, Iceberg
    * rewrite_data_files) executes. The single-partition window is
    * deliberate and safe: it runs on the MANIFEST (one row per file —
    * ~100k rows for 100 TB of 1 GB files), never on the data; the data
    * itself moves in one write shuffled by the resulting bin id.
    */
  def binPack(sizeCol: Column, orderCol: Column, target: Long): Column = {
    val w = org.apache.spark.sql.expressions.Window.orderBy(orderCol)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    // Double division + truncating cast is exact floor-div here: the
    // prefix sum stays an exact double below 2^53 (100 TB in bytes is
    // 1e14), and with target ≥ 2 the quotient can never round up across
    // an integer boundary (the gap 1/target dwarfs a half-ulp of any
    // representable quotient).
    ((sum(sizeCol).over(w) - sizeCol) / target).cast("long")
  }
}
