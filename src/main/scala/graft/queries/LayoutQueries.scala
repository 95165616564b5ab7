package graft.queries

import graft.operators.Layout
import org.apache.spark.sql.functions._

/** Data-layout optimization queries (SURVEY.md §2C, lakehouse OPTIMIZE
  * surface): z-order multi-dimensional clustering quality and compaction
  * bin-packing, both as exact integer plans under the oracle gate.
  */
object LayoutQueries extends Catalog {

  /** DuckDB replay of the 5-bit grid normalization + Layout.hilbertIndex's
    * five quadrant/rotate steps. Ends with CTEs `grid(pg, sg)` and
    * `h5(pg, sg, h)`. Shared by q_layout_hilbert and q_layout_pruning.
    */
  private def duckHilbertCtes: String = {
    def step(prev: String, out: String, s: Int) = {
      val add = s.toLong * s
      s"""$out AS (
         |  SELECT pg, sg,
         |         CASE WHEN ry = 0 THEN CASE WHEN rx = 1 THEN ${s - 1} - y ELSE y END ELSE x END AS x,
         |         CASE WHEN ry = 0 THEN CASE WHEN rx = 1 THEN ${s - 1} - x ELSE x END ELSE y END AS y,
         |         h + $add * xor(3 * rx, ry) AS h
         |  FROM (SELECT *, CASE WHEN (x & $s) != 0 THEN 1 ELSE 0 END AS rx,
         |                  CASE WHEN (y & $s) != 0 THEN 1 ELSE 0 END AS ry FROM $prev)
         |)""".stripMargin
    }
    s"""WITH g0 AS (
       |  SELECT CAST(l_partkey AS BIGINT) AS p,
       |         CAST(l_suppkey AS BIGINT) AS s
       |  FROM lineitem
       |), mm AS (
       |  SELECT MAX(p) AS pm, MAX(s) AS sm FROM g0
       |), grid AS (
       |  SELECT (p * 32 // (pm + 1)) AS pg,
       |         (s * 32 // (sm + 1)) AS sg
       |  FROM g0 CROSS JOIN mm
       |), h0 AS (
       |  SELECT pg, sg, pg AS x, sg AS y, CAST(0 AS BIGINT) AS h FROM grid
       |), ${step("h0", "h1", 16)},
       |${step("h1", "h2", 8)},
       |${step("h2", "h3", 4)},
       |${step("h3", "h4", 2)},
       |h5 AS (
       |  SELECT pg, sg, h + xor(3 * rx, ry) AS h
       |  FROM (SELECT *, CASE WHEN (x & 1) != 0 THEN 1 ELSE 0 END AS rx,
       |                  CASE WHEN (y & 1) != 0 THEN 1 ELSE 0 END AS ry FROM h4)
       |)""".stripMargin
  }

  def queries: Map[String, Q] = Map(

    // Z-order clustering vs. linear sort, measured by the file-skipping
    // envelope it buys. Both dims are normalized onto a 10-bit grid
    // anchored on the BROADCAST global max — pg = p·1024 div (max_p + 1),
    // exact integer arithmetic, the value→grid mapping every z-order
    // writer performs (same one-row-aggregate + broadcast-cross-join
    // scalar-gate shape as q_agg_histogram, so it costs one fact scan at
    // any corpus size and adapts to any key domain). The grids interleave
    // into a 20-bit Morton code sliced into 32 equi-width curve cells by
    // its top 5 bits (map-side arithmetic — the production equi-depth
    // variant slices by sampled range boundaries via repartitionByRange,
    // whose sample-dependent cuts an exact oracle cannot pin, so the
    // cells here are the deterministic twin). For each cell = "file", the
    // query reports the min/max envelope in BOTH dims — the exact numbers
    // a reader's footer-stats pruning consults — next to the same
    // envelopes for a LINEAR layout sorted by partkey alone. The measured
    // contrast is the whole point of z-ordering: linear files are tight
    // in partkey but span the FULL suppkey domain (predicates on suppkey
    // skip nothing), z-order files are bounded in both. Fully
    // distributed: grid/interleave are codegen'd per-row terms, the
    // envelope is one partial-agg'd groupBy; no global sort anywhere.
    "q_layout_zorder" -> Q(
      t => {
        val g0 = t.lineitem.select(
          col("l_partkey").cast("long").as("p"),
          col("l_suppkey").cast("long").as("s"))
        val mm = g0.agg(max(col("p")).as("pm"), max(col("s")).as("sm"))
        val grid = g0.crossJoin(broadcast(mm))
          .select(expr("p * 1024 div (pm + 1)").as("pg"),
            expr("s * 1024 div (sm + 1)").as("sg"))
        val z = grid.select(col("pg"), col("sg"),
          shiftright(Layout.zValue(col("pg"), col("sg"), 10), 15).as("cell"),
          lit("zorder").as("layout"))
        val lin = grid.select(col("pg"), col("sg"),
          shiftright(col("pg"), 5).as("cell"), lit("linear").as("layout"))
        z.unionByName(lin)
          .groupBy(col("layout"), col("cell"))
          .agg(count(lit(1)).as("n"),
            min(col("pg")).as("pg_min"), max(col("pg")).as("pg_max"),
            min(col("sg")).as("sg_min"), max(col("sg")).as("sg_max"))
          .orderBy(col("layout"), col("cell"), col("n"),
            col("pg_min"), col("pg_max"), col("sg_min"), col("sg_max"))
      },
      Some("""WITH g0 AS (
             |  SELECT CAST(l_partkey AS BIGINT) AS p,
             |         CAST(l_suppkey AS BIGINT) AS s
             |  FROM lineitem
             |), mm AS (
             |  SELECT MAX(p) AS pm, MAX(s) AS sm FROM g0
             |), grid AS (
             |  SELECT (p * 1024 // (pm + 1)) AS pg,
             |         (s * 1024 // (sm + 1)) AS sg
             |  FROM g0 CROSS JOIN mm
             |), cells AS (
             |  SELECT 'zorder' AS layout,
             |         CAST(list_sum(list_transform(range(0, 10), i ->
             |           (((pg >> i) & 1) << (2*i)) + (((sg >> i) & 1) << (2*i+1))))
             |           AS BIGINT) >> 15 AS cell,
             |         pg, sg
             |  FROM grid
             |  UNION ALL
             |  SELECT 'linear', pg >> 5, pg, sg FROM grid
             |)
             |SELECT layout, cell, CAST(COUNT(*) AS BIGINT) AS n,
             |       MIN(pg) AS pg_min, MAX(pg) AS pg_max,
             |       MIN(sg) AS sg_min, MAX(sg) AS sg_max
             |FROM cells
             |GROUP BY layout, cell
             |ORDER BY layout NULLS FIRST, cell NULLS FIRST, n NULLS FIRST,
             |         pg_min NULLS FIRST, pg_max NULLS FIRST,
             |         sg_min NULLS FIRST, sg_max NULLS FIRST""".stripMargin)),

    // Hilbert-curve clustering vs Morton z-order on the SAME 5-bit grid —
    // the head-to-head every lakehouse layout engine runs when picking its
    // OPTIMIZE curve (Hilbert's adjacency property has no Morton "seams",
    // so its equi-width curve cells have tighter-or-equal per-cell min/max
    // envelopes — the numbers a reader's footer-stats pruning consults).
    // Same one-fact-scan shape as q_layout_zorder: max-anchored integer
    // grid normalization behind a broadcast scalar gate, then both curve
    // values as pure map-side codegen'd BIGINT terms (the Hilbert steps
    // unroll as 5 projection stages — see Layout.hilbertIndex), one
    // partial-agg'd groupBy for the envelopes, no global sort. The oracle
    // replays the identical 5-step quadrant/rotate recurrence as chained
    // CTEs, so the curve arithmetic itself sits under the exactness gate.
    "q_layout_hilbert" -> Q(
      t => {
        val g0 = t.lineitem.select(
          col("l_partkey").cast("long").as("p"),
          col("l_suppkey").cast("long").as("s"))
        val mm = g0.agg(max(col("p")).as("pm"), max(col("s")).as("sm"))
        val grid = g0.crossJoin(broadcast(mm))
          .select(expr("p * 32 div (pm + 1)").as("pg"),
            expr("s * 32 div (sm + 1)").as("sg"))
        val hil = Layout.hilbertIndex(grid, "pg", "sg", order = 5)
          .select(col("pg"), col("sg"),
            shiftright(col("h"), 5).as("cell"), lit("hilbert").as("layout"))
        val z = grid.select(col("pg"), col("sg"),
          shiftright(Layout.zValue(col("pg"), col("sg"), 5), 5).as("cell"),
          lit("zorder").as("layout"))
        hil.unionByName(z)
          .groupBy(col("layout"), col("cell"))
          .agg(count(lit(1)).as("n"),
            min(col("pg")).as("pg_min"), max(col("pg")).as("pg_max"),
            min(col("sg")).as("sg_min"), max(col("sg")).as("sg_max"))
          .orderBy(col("layout"), col("cell"), col("n"),
            col("pg_min"), col("pg_max"), col("sg_min"), col("sg_max"))
      },
      Some(s"""$duckHilbertCtes, cells AS (
             |  SELECT 'hilbert' AS layout, h >> 5 AS cell, pg, sg FROM h5
             |  UNION ALL
             |  SELECT 'zorder',
             |         CAST(list_sum(list_transform(range(0, 5), i ->
             |           (((pg >> i) & 1) << (2*i)) + (((sg >> i) & 1) << (2*i+1))))
             |           AS BIGINT) >> 5,
             |         pg, sg
             |  FROM grid
             |)
             |SELECT layout, cell, CAST(COUNT(*) AS BIGINT) AS n,
             |       MIN(pg) AS pg_min, MAX(pg) AS pg_max,
             |       MIN(sg) AS sg_min, MAX(sg) AS sg_max
             |FROM cells
             |GROUP BY layout, cell
             |ORDER BY layout NULLS FIRST, cell NULLS FIRST, n NULLS FIRST,
             |         pg_min NULLS FIRST, pg_max NULLS FIRST,
             |         sg_min NULLS FIRST, sg_max NULLS FIRST""".stripMargin)),

    // Native-kernel twin of q_layout_hilbert (the q_pipe_iso_trim_native
    // convention): the same grid and cells, but the curve value comes from
    // the fused codegen'd HilbertIndexExpression — one generated loop per
    // row instead of five chained projection stages. Shares the composed
    // form's oracle; LayoutSpec additionally proves the two forms
    // bit-identical on the full grid.
    "q_layout_hilbert_native" -> Q(
      t => {
        val g0 = t.lineitem.select(
          col("l_partkey").cast("long").as("p"),
          col("l_suppkey").cast("long").as("s"))
        val mm = g0.agg(max(col("p")).as("pm"), max(col("s")).as("sm"))
        val grid = g0.crossJoin(broadcast(mm))
          .select(expr("p * 32 div (pm + 1)").as("pg"),
            expr("s * 32 div (sm + 1)").as("sg"))
        val hil = grid.select(col("pg"), col("sg"),
          shiftright(graft.functions.HilbertIndexExpression
            .column(col("pg"), col("sg"), order = 5), 5).as("cell"),
          lit("hilbert").as("layout"))
        val z = grid.select(col("pg"), col("sg"),
          shiftright(Layout.zValue(col("pg"), col("sg"), 5), 5).as("cell"),
          lit("zorder").as("layout"))
        hil.unionByName(z)
          .groupBy(col("layout"), col("cell"))
          .agg(count(lit(1)).as("n"),
            min(col("pg")).as("pg_min"), max(col("pg")).as("pg_max"),
            min(col("sg")).as("sg_min"), max(col("sg")).as("sg_max"))
          .orderBy(col("layout"), col("cell"), col("n"),
            col("pg_min"), col("pg_max"), col("sg_min"), col("sg_max"))
      },
      Some(s"""$duckHilbertCtes, cells AS (
             |  SELECT 'hilbert' AS layout, h >> 5 AS cell, pg, sg FROM h5
             |  UNION ALL
             |  SELECT 'zorder',
             |         CAST(list_sum(list_transform(range(0, 5), i ->
             |           (((pg >> i) & 1) << (2*i)) + (((sg >> i) & 1) << (2*i+1))))
             |           AS BIGINT) >> 5,
             |         pg, sg
             |  FROM grid
             |)
             |SELECT layout, cell, CAST(COUNT(*) AS BIGINT) AS n,
             |       MIN(pg) AS pg_min, MAX(pg) AS pg_max,
             |       MIN(sg) AS sg_min, MAX(sg) AS sg_max
             |FROM cells
             |GROUP BY layout, cell
             |ORDER BY layout NULLS FIRST, cell NULLS FIRST, n NULLS FIRST,
             |         pg_min NULLS FIRST, pg_max NULLS FIRST,
             |         sg_min NULLS FIRST, sg_max NULLS FIRST""".stripMargin)),

    // File-skipping measurement — the number every layout decision is FOR:
    // given the per-cell ("file") min/max envelopes of three layouts over
    // the same 32×32 grid (linear pg sort, Morton, Hilbert), count how
    // many files a point predicate in EACH dimension actually has to scan
    // (probe within [min, max] — exactly the footer-stats test a parquet
    // reader runs). Linear files scan ~1 file for pg probes but ~all 32
    // for sg probes; both curves bound BOTH dims — the measured payoff of
    // multi-dimensional clustering, under the exact gate. The probe frame
    // is 16 literal rows (8 probes × 2 dims) broadcast against the 96-row
    // envelope manifest — all post-aggregate, nothing data-sized.
    "q_layout_pruning" -> Q(
      t => {
        val g0 = t.lineitem.select(
          col("l_partkey").cast("long").as("p"),
          col("l_suppkey").cast("long").as("s"))
        val mm = g0.agg(max(col("p")).as("pm"), max(col("s")).as("sm"))
        val grid = g0.crossJoin(broadcast(mm))
          .select(expr("p * 32 div (pm + 1)").as("pg"),
            expr("s * 32 div (sm + 1)").as("sg"))
        // production path: the fused codegen kernel (2.5× the composed
        // five-stage chain at sf0.1 — AbBench r10; bit-identical by
        // LayoutSpec, so the shared oracle gates it equally)
        val hil = grid.select(col("pg"), col("sg"),
          shiftright(graft.functions.HilbertIndexExpression
            .column(col("pg"), col("sg"), order = 5), 5).as("cell"),
          lit("hilbert").as("layout"))
        val zo = grid.select(col("pg"), col("sg"),
          shiftright(Layout.zValue(col("pg"), col("sg"), 5), 5).as("cell"),
          lit("zorder").as("layout"))
        val lin = grid.select(col("pg"), col("sg"),
          col("pg").as("cell"), lit("linear").as("layout"))
        val env = hil.unionByName(zo).unionByName(lin)
          .groupBy(col("layout"), col("cell"))
          .agg(min(col("pg")).as("pg_min"), max(col("pg")).as("pg_max"),
            min(col("sg")).as("sg_min"), max(col("sg")).as("sg_max"))
        val probes = t.spark.range(0, 8)
          .select((col("id") * 4).as("probe"),
            explode(array(lit("pg"), lit("sg"))).as("dim"))
        env.join(broadcast(probes),
          (col("dim") === "pg" &&
            col("probe").between(col("pg_min"), col("pg_max"))) ||
            (col("dim") === "sg" &&
              col("probe").between(col("sg_min"), col("sg_max"))))
          .groupBy(col("layout"), col("dim"), col("probe"))
          .agg(count(lit(1)).as("files_scanned"))
          .orderBy(col("layout"), col("dim"), col("probe"), col("files_scanned"))
      },
      Some(s"""$duckHilbertCtes, cells AS (
             |  SELECT 'hilbert' AS layout, h >> 5 AS cell, pg, sg FROM h5
             |  UNION ALL
             |  SELECT 'zorder',
             |         CAST(list_sum(list_transform(range(0, 5), i ->
             |           (((pg >> i) & 1) << (2*i)) + (((sg >> i) & 1) << (2*i+1))))
             |           AS BIGINT) >> 5,
             |         pg, sg
             |  FROM grid
             |  UNION ALL
             |  SELECT 'linear', pg, pg, sg FROM grid
             |), env AS (
             |  SELECT layout, cell,
             |         MIN(pg) AS pg_min, MAX(pg) AS pg_max,
             |         MIN(sg) AS sg_min, MAX(sg) AS sg_max
             |  FROM cells GROUP BY layout, cell
             |), probes AS (
             |  SELECT CAST(t.i * 4 AS BIGINT) AS probe, d.dim
             |  FROM range(0, 8) t(i) CROSS JOIN (VALUES ('pg'), ('sg')) d(dim)
             |)
             |SELECT layout, dim, probe, CAST(COUNT(*) AS BIGINT) AS files_scanned
             |FROM env JOIN probes
             |  ON (dim = 'pg' AND probe BETWEEN pg_min AND pg_max)
             |  OR (dim = 'sg' AND probe BETWEEN sg_min AND sg_max)
             |GROUP BY layout, dim, probe
             |ORDER BY layout NULLS FIRST, dim NULLS FIRST, probe NULLS FIRST,
             |         files_scanned NULLS FIRST""".stripMargin)),

    // Compaction planning — the small-file problem's fix: pack a manifest
    // of per-day "files" (one row per o_orderdate, size = row count) into
    // target-sized bins by streaming first-fit over the date order, and
    // report each planned output file's composition. The window runs on
    // the aggregated manifest (~2.4k rows here; ~100k for 100 TB of 1 GB
    // files), NOT the data — compaction planners are manifest-scale by
    // construction, and the data itself would move in one shuffle keyed
    // by the emitted bin id. All arithmetic is exact BIGINT.
    "q_layout_binpack" -> Q(
      t => {
        val files = t.orders
          .groupBy(date_format(col("o_orderdate"), "yyyy-MM-dd").as("f"))
          .agg(count(lit(1)).cast("long").as("n"))
        files
          .withColumn("bin", Layout.binPack(col("n"), col("f"), 2000L))
          .groupBy(col("bin"))
          .agg(count(lit(1)).as("n_files"), sum(col("n")).as("total_rows"),
            min(col("f")).as("first_file"), max(col("f")).as("last_file"))
          .orderBy(col("bin"), col("n_files"), col("total_rows"),
            col("first_file"), col("last_file"))
      },
      Some("""WITH files AS (
             |  SELECT strftime(o_orderdate, '%Y-%m-%d') AS f,
             |         CAST(COUNT(*) AS BIGINT) AS n
             |  FROM orders GROUP BY 1
             |), planned AS (
             |  SELECT f, n,
             |         CAST((CAST(SUM(n) OVER (ORDER BY f
             |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |               AS BIGINT) - n) // 2000 AS BIGINT) AS bin
             |  FROM files
             |)
             |SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_files,
             |       CAST(SUM(n) AS BIGINT) AS total_rows,
             |       MIN(f) AS first_file, MAX(f) AS last_file
             |FROM planned
             |GROUP BY bin
             |ORDER BY bin NULLS FIRST, n_files NULLS FIRST,
             |         total_rows NULLS FIRST, first_file NULLS FIRST,
             |         last_file NULLS FIRST""".stripMargin)))
}
