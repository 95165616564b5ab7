package graft

import graft.queries.AllQueries
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-round benchmark main (driver contract): runs the headline queries at
  * SPARK_GRAFT_SF_DIR, fully evaluating each plan through the noop sink
  * (every operator executes; nothing is optimized away by a count-only
  * terminal), and prints ONE JSON line.
  */
object Bench {

  /** Representative cross-section: scan+filter, hash agg, 3-table join,
    * as-of join, window top-k + frames, set op, LSH dedup, ANN top-k,
    * scalar-heavy projection, batch kernel. The first ten are the
    * round-over-round comparable set (unchanged since r4); r6 appends the
    * two newest heavy hitters — iterative CC clustering and the bucketed
    * range join — r8 appends the driver-iterative quantized k-means, and
    * r9 the five-table star join (the deepest relational anchor: join
    * order / runtime-broadcast decisions on deep chains are where plans
    * break at 100×) and the Q21-shaped dual-correlation anchor (semi+anti
    * joins against the full fact — the decorrelated-subquery plan family),
    * so the bench signal covers them too. Late-r9 appends the band-blocked
    * SimHash dedup (the Σ|bucket|² candidate join), the Q2-shaped
    * min-cost join-back, and the z-order layout planner (a 60-term
    * codegen'd bit expression over the full fact — pure map throughput),
    * then the Q9-shaped five-table profit join (dim-priced cost netting —
    * classically among the heaviest TPC-H plans) and the one-window-pass
    * last-touch attribution over the event stream.
    */
  val headline: Seq[String] = Seq(
    "q_scan_project",
    "q_agg_pricing_summary",
    "q_join_inner",
    "q_join_asof",
    "q_win_topk_per_group",
    "q_win_running_frames",
    "q_set_union_distinct",
    "q_dedup_lsh_pairs",
    "q_sim_bruteforce_topk",
    "q_pipe_iso_trim",
    "q_dedup_cc",
    "q_join_range_bucketed",
    "q_sim_kmeans",
    "q_join_star",
    "q_join_waiting_suppliers",
    // r10: the Pregel anchor is the 1-superstep variant — same measured
    // shape (edge checkpoint + rank join + contribution sum), a third of
    // the stage count. The 3-superstep q_graph_pagerank's 12 small stages
    // made it the bench's noise ceiling (r9 runs spanned 2.5-5.4s on
    // identical code); its linearity is still pinned by the 10× probe.
    "q_graph_pagerank_1step",
    "q_dedup_simhash_bands",
    "q_join_min_cost_supplier",
    "q_layout_zorder",
    "q_join_product_profit",
    "q_events_attribution",
    // r9 third-continuation additions, each a distinct heavy shape: the
    // 9×-probe cell-hash spatial radius join, the double-distinct sliding
    // window rollup, and the d²-bounded narrow co-moment expansion.
    "q_join_spatial_grid",
    "q_events_wau",
    "q_sim_covariance",
    // r10 additions: the Hilbert curve via the fused codegen kernel (the
    // production form — AbBench r10: 0.384 s vs 0.957 s for the composed
    // five-stage chain) and the running-distinct rewrite (two same-key
    // window exchanges over the full event stream — the stacked-window
    // shape).
    "q_layout_hilbert_native",
    "q_win_running_distinct",
    // late-r10 additions: the bounded forward-explode + ≤7-row-window
    // rolling median (the non-distributive rolling-rank shape) and the
    // CEP symbol-string build (collect_list + array_sort + regex — the
    // heaviest per-user reassembly in the catalog).
    "q_ts_rolling_median",
    "q_events_pattern_match",
    // The whole-operator extension next to its composed twin (q_join_asof
    // above): round-over-round signal for the native exec. NOTE (r11,
    // reconciling r10 verdict task 3): these two catalog entries read as
    // PARITY here by construction — the catalog queries append a global
    // orderBy (oracle determinism) whose range-sort costs the same in both
    // forms and floors the comparison (AbBench r11: catalog twins 0.744 vs
    // 0.728 s). The operator-level number is the bare A/B in
    // tools/AbBench.scala: native 1.43× over composed at sf0.1 (0.487 vs
    // 0.696 s, medians of 5 under this same estimator). Treat these two
    // rows as regression canaries, not as the exec-vs-composed comparison.
    "q_join_asof_native",
    // r11 addition: the explicit bloom semi-join reduction (scalar-subquery
    // BloomFilterAggregate build + might_contain probe on the fact scan) —
    // the exchange-volume lever the catalog's other joins don't exercise.
    "q_join_bloom_prefilter")

  /** Wait (bounded) until no job, stage, or task is still in flight, so a
    * following System.gc() cannot race in-flight work — the root cause of
    * the intermittent r6 bench-tail error (r7 verdict task 7):
    *
    * `ERROR DAGScheduler: Failed to update accumulator N (Unknown class)` /
    * `SparkException: attempted to access non-existent accumulator N`
    *
    * Root cause, pinned by deterministic reproduction in r8 (the
    * gc-per-query estimator turned r6's intermittent error into an
    * every-run burst of exactly 5 lines, always inside q_dedup_lsh_pairs
    * — the one headline query that used a LAZY localCheckpoint):
    * `localCheckpoint(false)` defers materialization to a backfill job
    * Spark appends after the first consuming action (core
    * `RDD.doCheckpoint` → `LocalRDDCheckpointData.doCheckpoint`, a
    * separate `runJob` over not-yet-cached partitions). Spark's
    * accumulator registry holds WEAK references
    * (`org.apache.spark.util.AccumulatorContext.originals`), and the
    * appended job's task-metrics accumulators are scheduler-owned — not
    * reachable from the caller's DataFrame — so once that job's stage is
    * torn down, a forced GC collects them; a completion event still in
    * flight then makes `DAGScheduler.updateAccumulators` look up the dead
    * id and throw `attempted to access non-existent accumulator`. The
    * scheduler wraps that path in a NonFatal catch and only logs — the
    * owning query's job is already done, so results are NEVER affected
    * (verified: identical bench totals and green correctness across
    * reproducing runs) — but an [error]-level bench tail is
    * indistinguishable from a real failure to a log reader. Fixes, in
    * order of effect: (1) every always-consumed localCheckpoint in the
    * library is now EAGER (materializes inside the main action, no
    * appended job — confirmed to zero the error across repeated benches);
    * (2) this quiesce drains visibly active work before each forced GC;
    * (3) the generational DataFrame retention below keeps the previous
    * queries' plan-owned accumulators registered across the GC boundary.
    * The 2s bound keeps a wedged stage from hanging the bench (then the
    * benign error may reappear, logged-and-ignored).
    */
  private[graft] def quiesce(spark: SparkSession): Unit = {
    val tracker = spark.sparkContext.statusTracker
    val deadline = System.nanoTime() + 2000000000L
    def busy =
      tracker.getActiveJobIds().nonEmpty || tracker.getActiveStageIds().nonEmpty ||
        tracker.getExecutorInfos.map(_.numRunningTasks()).sum > 0
    while (busy && System.nanoTime() < deadline) Thread.sleep(10)
  }

  /** Self-calibration legs (r12 verdict task 1): two fixed kernels with
    * KNOWN-CONSTANT work, measured in the same process interleaved with
    * the headline loop, so every bench window carries its own
    * interference index. Co-tenant windows have distorted three
    * consecutive rounds' wall-clock readings (r11 driver window; r12 A/B
    * runs; r12 driver window, where scan_project read 2.2× its true cost
    * with all five raw runs uniformly inflated — invisible to the
    * 3×-min trim, which needs at least one clean run). A reader compares
    * a window's calib numbers against the round's best window (or the
    * committed reference values in GATE_r13) and normalizes or discards
    * instead of adjudicating from raw-run forensics.
    *
    *  - `spin`: 2×10⁸ iterations of a single-thread 64-bit LCG+xorshift
    *    mix — pure CPU, no allocation, no Spark; inflates 1:1 with CPU
    *    contention and scheduler preemption.
    *  - `shuffle`: a fixed 32-task map + 32-partition hash exchange +
    *    reduce over 3.2M deterministic longs (spark.range, no input
    *    data) — inflates with executor-thread contention, GC pressure,
    *    and shuffle-IO interference, the components the spin leg can't
    *    see.
    */
  private[graft] def calibSpin(): Double = {
    val t0 = System.nanoTime()
    var h = 0x9E3779B97F4A7C15L
    var i = 0
    while (i < 200000000) {
      h = h * 6364136223846793005L + 1442695040888963407L
      h ^= h >>> 33
      i += 1
    }
    // data dependency on h defeats dead-code elimination; never true
    if (h == 42L) System.err.println("calib")
    (System.nanoTime() - t0) / 1e9
  }

  private[graft] def calibShuffle(spark: SparkSession): Double = {
    import org.apache.spark.sql.functions.{col, count, lit, sum}
    val t0 = System.nanoTime()
    val df = spark.range(0L, 3200000L, 1L, 32)
      .select((col("id") % 997L).as("k"), col("id").as("v"))
      .repartition(32, col("k"))
      .groupBy(col("k")).agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
    df.queryExecution.toRdd.count()
    (System.nanoTime() - t0) / 1e9
  }

  /** Third calib leg (added after the r13 live case study — see
    * GATE_r13): a full parquet scan+decode+aggregate over THIS window's
    * input data. The r13 middle bench run had scan-heavy queries
    * uniformly inflated ~30-40% while `spin` stayed flat (CPU was fine)
    * and `shuffle` was blind (its working set is tiny and synthetic) —
    * the contention class was memory-bandwidth/page-cache, which only a
    * real columnar decode over real bytes feels. Work is constant WITHIN
    * a window and across same-SF runs (the comparison that matters);
    * cross-SF values are not comparable and the GATE reference states
    * its SF.
    */
  private[graft] def calibScan(spark: SparkSession, sfDir: String): Double = {
    import org.apache.spark.sql.functions.{col, count, sum}
    val t0 = System.nanoTime()
    val df = Graft.table(spark, sfDir, "lineitem")
      .select(col("l_extendedprice"), col("l_quantity"), col("l_orderkey"))
      .agg(sum(col("l_extendedprice")).as("s"), sum(col("l_quantity")).as("q"),
        count(col("l_orderkey")).as("n"))
    df.queryExecution.toRdd.count()
    (System.nanoTime() - t0) / 1e9
  }

  // ===== Window-quality auto-taint (r13 verdict task 3) =====
  //
  // The >25%-calib-deviation rule lived in GATE prose and judge heads; in
  // r13 the DRIVER's own window tripped it (calib.scan 0.225 vs the sealed
  // 0.180 — exactly the threshold) and only cross-referencing caught it.
  // The bench now applies the rule itself: each calib-leg MEDIAN is
  // compared against the round's sealed reference values and any leg at or
  // above 1.25× lands in a "tainted" array on the MAIN stdout line, so
  // every consumer sees the window quality without forensics.
  // References default to the GATE_r13 seal (sf0.1 window; the scan leg is
  // overhead-dominated at test SFs so sf0.001/sf0.1 read alike — see
  // calibScan scaladoc) and are overridable per sealed round via
  // SPARK_GRAFT_CALIB_REF="spin=0.428,shuffle=0.444,scan=0.180".

  /** A calib median at or above this multiple of its reference marks the
    * window tainted (GATE rule: ">25% deviation"; r13's live case read
    * exactly 1.25× and WAS a contended window, so the boundary flags).
    */
  private[graft] val CalibTaintFactor = 1.25

  /** GATE_r13 sealed calibration references (sf0.1 final-seal window). */
  private[graft] val DefaultCalibRef: Map[String, Double] =
    Map("spin" -> 0.428, "shuffle" -> 0.444, "scan" -> 0.180)

  /** Parse "spin=0.428,shuffle=0.444,scan=0.180" (the
    * SPARK_GRAFT_CALIB_REF override format). Unknown legs are carried —
    * taint comparison only consults legs present in BOTH maps.
    */
  private[graft] def parseCalibRef(s: String): Map[String, Double] =
    s.split(",").iterator.map(_.trim).filter(_.nonEmpty).map { kv =>
      val i = kv.indexOf('=')
      require(i > 0, s"calib ref entry '$kv' is not leg=seconds")
      kv.substring(0, i).trim -> kv.substring(i + 1).trim.toDouble
    }.toMap

  /** Legs whose median reads at or above [[CalibTaintFactor]] × reference.
    * A leg with no sample this window (median < 0) is reported as tainted
    * too — an absent interference index is not a clean one.
    */
  private[graft] def taintedLegs(medians: Map[String, Double],
      refs: Map[String, Double]): Seq[String] =
    refs.keys.toSeq.sorted.filter { k =>
      medians.get(k).exists(m => m < 0 || m >= CalibTaintFactor * refs(k))
    }

  /** Per-BRACKET taint (the r14 seal-window lesson, proven live twice in
    * one session): the calib legs bracket the window — samples before the
    * headline loop and samples after the probes — and a co-tenant that
    * occupies only ONE half leaves the POOLED median under the threshold
    * while every query in that half reads 1.3-1.7× high (observed: scan
    * bracket medians 0.298 vs 0.157 s pooling to 0.224 = 1.24× ref,
    * one sample under the 1.25 bar, in a window whose headline total ran
    * 1.4× the clean seal). So the taint test runs per bracket: a leg is
    * tainted when ANY bracket's median trips the factor — the pooled
    * median stays the round-over-round comparable number in `calib`.
    */
  private[graft] def taintedLegsBracketed(brackets: Map[String, Seq[Seq[Double]]],
      refs: Map[String, Double]): Seq[String] = {
    def med(xs: Seq[Double]): Double =
      if (xs.isEmpty) -1.0 else xs.sorted.apply(xs.size / 2)
    refs.keys.toSeq.sorted.filter { k =>
      brackets.get(k).exists { bs =>
        bs.isEmpty || bs.exists { b =>
          val m = med(b)
          m < 0 || m >= CalibTaintFactor * refs(k)
        }
      }
    }
  }

  private[graft] def taintedJson(legs: Seq[String]): String =
    legs.map("\"" + _ + "\"").mkString("[", ",", "]")

  // ===== Contention-resilient sealing (r14 verdict task 1) =====
  //
  // r14 spent 13 bench windows to get 2 clean ones: the taint flag
  // adjudicated dirty windows correctly, but the only remedy was a full
  // ~10-min re-run and a human reading calib numbers. The adjudication
  // now lives INSIDE one bench invocation:
  //
  //   - the headline set runs in CHUNKS of [[ChunkSize]] queries with a
  //     light calib BOUNDARY (1 spin + 2 shuffle + 2 scan samples)
  //     between chunks — contention localizes to the chunk(s) it
  //     actually touched instead of smearing over the whole window;
  //   - a chunk is DIRTY when either surrounding boundary trips the
  //     taint factor; after the first pass, dirty chunks are re-run
  //     under a calib re-check, at most [[MaxChunkRetries]] rounds —
  //     a retry is ACCEPTED only when its own pre- and post-boundaries
  //     are both clean;
  //   - the MAIN line always carries a `composite_clean` object the
  //     driver can parse: the total over clean-window values (first-pass
  //     value for clean chunks, accepted retry value for re-queried
  //     ones), the re-queried per-query values, and the names of queries
  //     that never got a clean measurement ("unclean" — the honest
  //     remainder, their first-pass value still counted in the total).
  //
  // `queries`/`total`/`tainted` keep their exact r13/r14 semantics (the
  // FIRST pass and its pooled pre/post brackets) so round-over-round
  // deltas stay comparable; `composite_clean` is the adjudicated number.

  /** Headline queries per boundary-bracketed chunk. 6 ≈ 3-5 min of
    * queries between boundary samples at sf0.1 — fine enough to localize
    * a co-tenant burst, coarse enough that boundary cost (~1.7 s each)
    * stays under 2% of the window.
    */
  private[graft] val ChunkSize = 6

  /** Retry rounds over still-dirty chunks after the first pass. Two
    * bounds the added wall-clock at roughly one extra chunk pass per
    * dirty chunk while covering the common case (a burst that ends).
    */
  private[graft] val MaxChunkRetries = 2

  /** Boundary taint: a leg trips when its MINIMUM boundary sample is at
    * or above factor × reference (or it has no sample). Minimum, not
    * median: one quiet sample proves the window COULD run at reference
    * speed right then, while sustained co-tenancy inflates every sample —
    * so min trades a little sensitivity to intermittent bursts for far
    * fewer false retries on 1-2-sample boundaries.
    */
  private[graft] def boundaryTainted(samples: Map[String, Seq[Double]],
      refs: Map[String, Double]): Seq[String] =
    refs.keys.toSeq.sorted.filter { k =>
      val xs = samples.getOrElse(k, Seq.empty)
      xs.isEmpty || xs.min >= CalibTaintFactor * refs(k)
    }

  /** Chunk indices whose window was dirty on the first pass: chunk i sits
    * between boundaries i and i+1; either tripping marks it.
    */
  private[graft] def dirtyChunks(boundaries: Seq[Map[String, Seq[Double]]],
      nChunks: Int, refs: Map[String, Double]): Set[Int] =
    (0 until nChunks).filter { i =>
      boundaryTainted(boundaries(i), refs).nonEmpty ||
        boundaryTainted(boundaries(i + 1), refs).nonEmpty
    }.toSet

  /** The clean-composite per-query values: first-pass value for queries
    * in clean chunks, the accepted retry value for re-queried ones, and
    * the first-pass value (plus a listing in `unclean`) for queries whose
    * chunk never got a clean pass. Returns (perQuery in headline order,
    * unclean names).
    */
  private[graft] def compositeClean(
      first: Seq[(String, Double)],
      chunkOf: Map[String, Int],
      dirty: Set[Int],
      retriedClean: Map[String, Double]): (Seq[(String, Double)], Seq[String]) = {
    val perQuery = first.map { case (n, v) =>
      if (!dirty(chunkOf(n))) n -> v
      else n -> retriedClean.getOrElse(n, v)
    }
    val unclean = first.collect {
      case (n, _) if dirty(chunkOf(n)) && !retriedClean.contains(n) => n
    }
    (perQuery, unclean)
  }

  /** Inline cap for the main line's composite detail: at most this many
    * re-queried entries and unclean names ride on the MAIN line (with the
    * true counts always present and `"truncated":true` when clipped); the
    * full maps live in target/bench.json. 4 keeps the worst-plausible
    * main line under the guard-minus-300 headroom pin (BenchLineSpec).
    */
  private[graft] val CompositeInlineMax = 4

  /** The main line's `composite_clean` JSON object: the adjudicated total
    * (clean-window value per query), the exact re-queried/unclean counts,
    * and a `detail` ladder (r16 verdict task 3 — the sealed artifact must
    * say WHICH queries were re-queried without reading target/bench.json):
    *
    *   - `"full"` — the re-queried per-query values and never-clean query
    *     names, clipped to [[CompositeInlineMax]] inline;
    *   - `"names"` — the COMPLETE re-queried and unclean name lists, no
    *     values (the stdout-budget fallback when the full detail would
    *     outgrow the line budget: names are the forensic signal, values
    *     are a lookup);
    *   - `"counts"` — only total + counts (the last resort, when even the
    *     name list overflows).
    *
    * Whatever the stage, the full maps live in target/bench.json (the main
    * line's `detail` pointer). Inline omission is flagged in-band with
    * `"truncated":true` — except the names form's value deferral, which
    * the `requeried_names` key itself marks structurally (a flag there
    * would spend exactly the budget the form exists to save).
    */
  private[graft] def compositeJson(perQuery: Seq[(String, Double)],
      requeried: Map[String, Double], unclean: Seq[String],
      detail: String = "full"): String = {
    val total = perQuery.map(_._2).filter(_ >= 0).sum
    val rqAll = requeried.toSeq.sortBy(_._1)
    val head = f""""composite_clean":{"total":$total%.3f,""" +
      f""""requeried_n":${rqAll.size}%d,"unclean_n":${unclean.size}%d"""
    val unAll = unclean.map("\"" + _ + "\"").mkString("[", ",", "]")
    detail match {
      case "counts" =>
        val trunc = if (rqAll.nonEmpty || unclean.nonEmpty) ""","truncated":true""" else ""
        head + trunc + "}"
      case "names" =>
        // every NAME is inline (the self-containedness contract); only the
        // per-query VALUES defer to the main line's target/bench.json
        // pointer — marked structurally by the `requeried_names` key
        // itself, so no extra flag spends budget; an empty unclean list is
        // omitted (unclean_n already says 0)
        val namesArr = rqAll.map("\"" + _._1 + "\"").mkString("[", ",", "]")
        val un = if (unclean.isEmpty) "" else s""","unclean":$unAll"""
        head + s""","requeried_names":$namesArr$un}"""
      case _ => // full
        val clipped = rqAll.size > CompositeInlineMax || unclean.size > CompositeInlineMax
        val rq = rqAll.take(CompositeInlineMax)
          .map { case (n, v) => f""""$n":$v%.3f""" }.mkString("{", ",", "}")
        val un = unclean.take(CompositeInlineMax)
          .map("\"" + _ + "\"").mkString("[", ",", "]")
        val trunc = if (clipped) ""","truncated":true""" else ""
        head + s""","requeried":$rq,"unclean":$un$trunc}"""
    }
  }

  // ===== Two-line stdout contract (r13 verdict task 2) =====
  //
  // The single compact line reached 1791 of its 1800-char guard in r13 —
  // 9 chars of headroom, one added field away from silently dropping the
  // scale probe. The stdout record is now TWO lines:
  //
  //   line P (probes):  {"graft_probes":true,"scale_probe":...,
  //                      "exchange_probe":...}
  //   line M (main):    {"metric":"total",...,"tainted":...,"calib":...,
  //                      "queries":...,"composite_clean":...}
  //                      <- ALWAYS the final stdout line
  //
  // Extraction contract: the LAST stdout line is the main record (the
  // driver parses it; it carries everything that must never truncate —
  // medians, total, estimator, window quality). The line immediately
  // before it is the probes record. Both lines are emitted twice,
  // byte-identical, around session shutdown (see the emit site); a
  // consumer with a ~2000-char tail-capture window holds one intact
  // (P, M) pair because their combined length is guarded at
  // [[StdoutBudget]] — when the probes line would break that, it degrades
  // to an explicit pointer at stdout WITH a stderr log line (never a
  // silent drop; the full record is always in target/bench.json).

  /** Main line must stay well under a ~2000-char tail window on its own. */
  private[graft] val MainLineGuard = 1800

  /** Combined (P + M + newlines) budget: 2000-char tail window minus
    * margin for a stray footer.
    */
  private[graft] val StdoutBudget = 1950

  /** The MAIN (final) stdout line — everything that must never truncate.
    * Extracted so BenchLineSpec can pin its size and parseability against
    * the real headline set.
    *
    * r19 verdict task 2 additions (existing fields byte-compatible):
    *  - `cpus`: the core count this window ran with (`$SPARK_GRAFT_CPUS`),
    *    so a consumer holding only the line knows which scaling leg it is;
    *  - `task_ms`: per-query summed executor task time (executorRunTime,
    *    ms, averaged over the 5 timed runs), as an ARRAY aligned with the
    *    `queries` map's key order — the named map would cost ~900 chars
    *    against the stdout budget, the aligned array ~200; the named form
    *    lives in target/bench.json as `task_ms_by_query`. Task time is
    *    core-count-invariant where walls are floor-dominated, so
    *    (task_ms / cpus) vs wall separates the driver/AQE stage floor
    *    from genuinely serial compute across the driver's two runs.
    */
  private[graft] def buildMainLine(total: Double, taintedArr: String,
      calibCompact: String, qsCompact: String, compositeObj: String,
      sfDir: String, cpus: String = "32", taskMsArr: String = "[]"): String =
    f"""{"metric":"total","value":$total%.3f,"unit":"sec","estimator":"med5_trim3xmin","cpus":$cpus,"tainted":$taintedArr$calibCompact,"queries":$qsCompact,"task_ms":$taskMsArr,$compositeObj,"sf":"$sfDir","detail":"target/bench.json"}"""

  /** The probes line's degraded form: an explicit in-band pointer, never
    * a silent drop (r13 ADVICE).
    */
  private[graft] val ProbesPointer =
    """{"graft_probes":true,"dropped":"stdout budget","see":"target/bench.json"}"""

  /** Budget degradation ladder (r16 verdict task 3 added the names
    * stages): the pair is tried with the DETAILED main line first; if
    * over budget, with the NAMES-only composite (the complete
    * requeried/unclean name lists — the sealed artifact then still says
    * WHICH queries were re-queried, only their values defer to
    * target/bench.json); if even that pair is over budget, the PROBES
    * line degrades to its pointer while the name list survives — the
    * names are the round-specific retry forensics, the probes are
    * round-stable and always in target/bench.json, so the names outrank
    * them; counts-only is the genuine last resort (a name list so long it
    * overflows the budget even against the 75-char pointer), paired
    * through the 2-arg stage so the final pair is (pointer, counts) if
    * needed (r15 ADVICE: the last stage must be the strictly smallest
    * pair). Every stage logs to stderr — nothing is ever dropped
    * silently.
    */
  private[graft] def assembleStdout(probesLine: String, mainDetail: String,
      mainNames: String, mainCounts: String): Seq[String] = {
    if (probesLine.length + mainDetail.length + 2 <= StdoutBudget)
      assembleStdout(probesLine, mainDetail)
    else if (probesLine.length + mainNames.length + 2 <= StdoutBudget) {
      System.err.println(s"[bench] composite value detail (${mainDetail.length} " +
        s"chars) dropped from the main line for the stdout budget; the complete " +
        s"requeried-name list kept, values in target/bench.json")
      assembleStdout(probesLine, mainNames)
    } else if (ProbesPointer.length + mainNames.length + 2 <= StdoutBudget) {
      System.err.println(s"[bench] probes line (${probesLine.length} chars) " +
        s"dropped from stdout to keep the complete requeried-name list " +
        s"(${mainNames.length}-char main); full probes in target/bench.json")
      Seq(ProbesPointer, mainNames)
    } else {
      System.err.println(s"[bench] composite name list (${mainNames.length} chars) " +
        s"over the stdout budget even against the probes pointer; counts-only " +
        s"composite kept, full detail in target/bench.json")
      assembleStdout(probesLine, mainCounts)
    }
  }

  /** The two stdout lines in print order (probes first, main LAST), with
    * the probes line degraded to a pointer when the pair would outgrow a
    * tail-capture window. Degradation is logged to stderr (r13 ADVICE:
    * never drop a field silently).
    */
  private[graft] def assembleStdout(probesLine: String, mainLine: String): Seq[String] = {
    if (mainLine.length > MainLineGuard)
      System.err.println(s"[bench] MAIN line ${mainLine.length} chars exceeds " +
        s"the $MainLineGuard guard - tail-window consumers may truncate it; " +
        "trim the headline set or the per-query precision")
    if (probesLine.length + mainLine.length + 2 <= StdoutBudget)
      Seq(probesLine, mainLine)
    else {
      System.err.println(s"[bench] probes line (${probesLine.length} chars) " +
        s"dropped from stdout: combined ${probesLine.length + mainLine.length}" +
        s" > $StdoutBudget budget; full probes in target/bench.json")
      Seq(ProbesPointer, mainLine)
    }
  }

  def main(args: Array[String]): Unit = {
    // The JSON line is built with f"...%.3f" interpolators, which format
    // with the JVM default locale — a comma-decimal locale would emit
    // `0,123` and break the driver's JSON parse. Pin ROOT once, up front.
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel(sys.env.getOrElse("SPARK_GRAFT_LOG", "WARN"))
    val tables = Tables(spark, sfDir)

    // Summed executor task time (r19 verdict task 2): every finished
    // task's executorRunTime lands in one counter; measureQuery brackets
    // its 5 timed runs with snapshots, so each query gets the task-ms its
    // runs actually executed. The listener bus is async — snapshots are
    // taken after quiesce() plus a short grace sleep, so trailing
    // completion events have landed (task-end dispatch is sub-ms once no
    // task is running; the grace bounds the residue to noise). Calib
    // legs, boundaries, and probes run OUTSIDE the snapshot windows.
    val taskMsCounter = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) { taskMsCounter.addAndGet(m.executorRunTime); () }
      }
    })
    def taskMsSnapshot(): Long = {
      quiesce(spark)
      Thread.sleep(50)
      taskMsCounter.get()
    }

    // Generational accumulator keep-alive (second half of the quiesce
    // fix): each run's DataFrame strongly references its plan's SQL-metric
    // accumulators, so holding the last TWO queries' DataFrames means a
    // forced GC can only unregister accumulators of queries ≥2 generations
    // old — whose tasks, orphaned or not, finished long ago. Rotated once
    // per query; ~2 queries' plan objects is trivial heap.
    val gen = new scala.collection.mutable.ArrayBuffer[DataFrame]()
    var gen1: List[DataFrame] = Nil
    var gen2: List[DataFrame] = Nil
    def rotateGenerations(): Unit = { gen2 = gen1; gen1 = gen.toList; gen.clear() }

    def runOnce(name: String): Double = {
      // t0 BEFORE plan construction: operators that materialize eagerly
      // (CC's per-round checkpoints, eager signature checkpoints) do real
      // work inside run(tables) — timing only the write would exclude it
      val t0 = System.nanoTime()
      val df = AllQueries.all(name).run(tables)
      df.write.format("noop").mode("overwrite").save()
      val t = (System.nanoTime() - t0) / 1e9
      gen += df
      t
    }

    // warm codegen + parquet footers once with the cheapest query
    try runOnce("q_scan_project") catch { case _: Throwable => () }

    // calibration samples bracket the whole window: 3 of each leg here,
    // 3 more after the probes (see calibSpin/calibShuffle scaladoc); the
    // compact line carries the medians, the file the raw arrays
    val spinRuns = scala.collection.mutable.ArrayBuffer[Double]()
    val shuffleRuns = scala.collection.mutable.ArrayBuffer[Double]()
    val scanRuns = scala.collection.mutable.ArrayBuffer[Double]()
    def sampleCalib(): Unit = {
      // Warm-up depth (r14 seal investigation, graft.tools.CalibProbe):
      // the scan kernel's fresh-JVM warm-up tail is LONG — on an IDLE
      // box (load 0.01) a once-warmed fresh JVM still reads
      // 0.257→0.234→0.230→0.208→0.195→0.199, i.e. ~4-5 iterations to
      // settle near the ~0.20 early-warm floor (the 0.13-0.16 deep-warm
      // floor arrives only after minutes of heavy query work) — and the
      // first shuffle job after startup can read ~2× (0.812 observed).
      // A single warm therefore put the whole PRE-headline bracket on
      // the warm-up slope, which the per-bracket taint test then
      // (correctly, per its references — but structurally) flagged on
      // every fresh JVM. Warm scan 3× and shuffle 2× so the first
      // bracket samples the settled kernel; the second bracket's extra
      // warms are ~free (already deep-warm by then). ~1s per bracket,
      // paid twice per bench.
      try {
        calibShuffle(spark); calibShuffle(spark)
        calibScan(spark, sfDir); calibScan(spark, sfDir); calibScan(spark, sfDir)
        ()
      } catch { case _: Throwable => () }
      (1 to 3).foreach { _ =>
        spinRuns += calibSpin()
        try shuffleRuns += calibShuffle(spark) catch { case _: Throwable => () }
        try scanRuns += calibScan(spark, sfDir) catch { case _: Throwable => () }
      }
    }
    sampleCalib()
    // bracket boundary per leg (failed legs skip appends, so sizes can
    // differ): everything before these indices is the PRE-headline
    // bracket, everything after the POST-probes one — the per-bracket
    // taint test needs the split (see taintedLegsBracketed)
    val bracket1 = Map("spin" -> spinRuns.size, "shuffle" -> shuffleRuns.size,
      "scan" -> scanRuns.size)

    // taint references resolve up front: the chunk boundaries and the
    // retry pass consult them mid-run (see the contention-resilient
    // sealing section above)
    val calibRefs = sys.env.get("SPARK_GRAFT_CALIB_REF")
      .map(parseCalibRef).filter(_.nonEmpty) // empty override -> defaults
      .getOrElse(DefaultCalibRef)

    /** One light calib boundary between headline chunks: 1 spin + 2
      * shuffle + 2 scan samples (~1.7 s). Everything is deep-warm by the
      * first boundary (sampleCalib just ran its warm-ups), so no per-
      * boundary warm-up — boundaryTainted's MIN estimator absorbs a
      * stray slow sample.
      */
    def sampleBoundary(): Map[String, Seq[Double]] = {
      def leg(f: => Double, n: Int): Seq[Double] =
        (1 to n).flatMap(_ => try Seq(f) catch { case _: Throwable => Seq.empty })
      Map("spin" -> leg(calibSpin(), 1),
        "shuffle" -> leg(calibShuffle(spark), 2),
        "scan" -> leg(calibScan(spark, sfDir), 2))
    }

    // The ScaleProbe's estimator, ported to the headline loop (r6/r7 verdict
    // task 1): three consecutive rounds showed the old single-session
    // median-of-3 cannot tell a 15-20s GC/heap-expansion pause from a real
    // regression (r5 "13.67x" scare, r6 9-of-10 phantom slowdown, r7
    // recovery on byte-identical code). Per query: one warmup run (codegen +
    // file listing for THIS plan), System.gc() to flush the warmup's
    // allocation debt, then 5 timed runs. The reported number is the median
    // — robust to two polluted runs — and the raw runs array is emitted in
    // the JSON so a phantom swing is inspectable instead of hidden behind
    // one scalar.
    def measureQuery(name: String): (String, Double, Double, Seq[Double], Long) = {
      // progress marker on stderr (driver parses stdout JSON only) — also
      // correlates any logged scheduler noise with the query that ran
      System.err.println(s"[bench] ${java.time.Instant.now()} $name")
      rotateGenerations() // frees gen k-2; k-1 stays pinned across this gc
      try runOnce(name) catch { case _: Throwable => () }
      quiesce(spark)
      System.gc()
      val taskMs0 = taskMsSnapshot()
      val runs = Seq.fill(5)(try runOnce(name) catch { case _: Throwable => -1.0 })
      // per-run average task time over the 5-run bracket (r19 task 2);
      // same-query bleed between runs averages out, cross-query bleed is
      // fenced by the quiesce+grace snapshots
      val taskMs = (taskMsSnapshot() - taskMs0) / 5
      val ok = runs.filter(_ >= 0)
      // Interference trim (r11 verdict task 2) — the probe's 3×-min pair
      // trim, applied to the headline estimator too: the r11 driver window
      // inflated untouched queries 50-70% (machine pauses measured at
      // 5-25× swings, vs ≤1.5× genuine run-to-run variance on this box),
      // and a plain median-of-5 only survives two polluted runs. Drop runs
      // above 3× the per-query minimum, then take the median of what
      // remains (the min always survives, so the trimmed set is never
      // empty). Estimator honesty (r12 ADVICE): BOTH medians are computed
      // — trimmed AND plain — and both land in target/bench.json
      // (queries/value vs queries_untrimmed/value_untrimmed) with the raw
      // runs arrays; the compact line carries the trimmed one plus an
      // explicit estimator tag, so round-over-round deltas are only ever
      // compared under a NAMED estimator and a code-introduced bimodal
      // regression (occasional spill/GC) is still visible in the
      // untrimmed file record.
      val medianPlain = if (ok.isEmpty) -1.0 else ok.sorted.apply(ok.size / 2)
      val median = if (ok.isEmpty) -1.0 else {
        val clean = ok.filter(_ <= 3 * ok.min)
        clean.sorted.apply(clean.size / 2)
      }
      (name, median, medianPlain, runs, taskMs)
    }

    // ---- first pass: chunked headline loop with calib boundaries ----
    val chunks: Vector[Vector[String]] =
      headline.grouped(ChunkSize).map(_.toVector).toVector
    val chunkOf: Map[String, Int] =
      chunks.zipWithIndex.flatMap { case (qs, i) => qs.map(_ -> i) }.toMap
    // diagnostic override, parsed and validated BEFORE the ~10-min first
    // pass so a typo fails in second one, not after the window is spent;
    // out-of-range indices would otherwise crash chunks(ci) in the retry
    // loop and lose every measurement
    val forcedDirty: Option[Set[Int]] =
      sys.env.get("SPARK_GRAFT_FORCE_DIRTY_CHUNKS").map { s =>
        val idx = s.split(",").iterator.map(_.trim).filter(_.nonEmpty).map { v =>
          require(v.forall(_.isDigit), s"SPARK_GRAFT_FORCE_DIRTY_CHUNKS entry '$v' is not a chunk index")
          v.toInt
        }.toSet
        val bad = idx.filterNot(i => i >= 0 && i < chunks.size)
        require(bad.isEmpty,
          s"SPARK_GRAFT_FORCE_DIRTY_CHUNKS indices $bad out of range [0, ${chunks.size})")
        idx
      }
    val boundariesB = Vector.newBuilder[Map[String, Seq[Double]]]
    boundariesB += sampleBoundary()
    val firstPassChunks = chunks.map { c =>
      val r = c.map(measureQuery)
      boundariesB += sampleBoundary()
      r
    }
    val results = firstPassChunks.flatten
    val boundarySamples = boundariesB.result()
    // the validated diagnostic override (above) forces chunks dirty
    // regardless of boundaries, to drive the requeue-accept path on
    // demand (window forensics / end-to-end checks of the retry machinery)
    val dirty = forcedDirty
      .getOrElse(dirtyChunks(boundarySamples, chunks.size, calibRefs))

    // ---- bounded retry of dirty chunks (contention-resilient sealing) --
    val retriedMedians = scala.collection.mutable.Map[String, Double]()
    val retriedRuns = scala.collection.mutable.Map[String, Seq[Double]]()
    val retryLog = scala.collection.mutable.ArrayBuffer[String]()
    // every boundary sampled during retries, keyed (chunk, round, phase):
    // the values that accepted or discarded a retry must be auditable
    // from the file record, not just named in the log
    val retryBoundaries =
      scala.collection.mutable.ArrayBuffer[(Int, Int, String, Map[String, Seq[Double]])]()
    var remaining = dirty
    var retryRound = 0
    while (remaining.nonEmpty && retryRound < MaxChunkRetries) {
      retryRound += 1
      remaining = remaining.toSeq.sorted.filterNot { ci =>
        // calib re-check BEFORE burning 5 runs per query into a window
        // that is still dirty; one short grace retry for a burst tail
        var pre = sampleBoundary()
        if (boundaryTainted(pre, calibRefs).nonEmpty) {
          Thread.sleep(5000L)
          pre = sampleBoundary()
        }
        retryBoundaries += ((ci, retryRound, "pre", pre))
        val preDirty = boundaryTainted(pre, calibRefs)
        if (preDirty.nonEmpty) {
          retryLog += s"chunk $ci round $retryRound: calib re-check dirty " +
            s"(${preDirty.mkString("+")}), deferred"
          false // keep for the next round
        } else {
          System.err.println(s"[bench] requeueing dirty chunk $ci: " +
            chunks(ci).mkString(", "))
          val res = chunks(ci).map(measureQuery)
          val post = sampleBoundary()
          retryBoundaries += ((ci, retryRound, "post", post))
          val postDirty = boundaryTainted(post, calibRefs)
          if (postDirty.isEmpty) {
            res.foreach { case (n, m, _, rs, _) =>
              retriedMedians(n) = m; retriedRuns(n) = rs
            }
            retryLog += s"chunk $ci round $retryRound: requeued clean"
            true // done with this chunk
          } else {
            retryLog += s"chunk $ci round $retryRound: post-boundary dirty " +
              s"(${postDirty.mkString("+")}), retry discarded"
            false
          }
        }
      }.toSet
    }
    remaining.toSeq.sorted.foreach { ci =>
      retryLog += s"chunk $ci: no clean window within $MaxChunkRetries rounds"
    }
    val (compositePerQuery, uncleanNames) = compositeClean(
      results.map { case (n, m, _, _, _) => (n, m) }, chunkOf, dirty,
      retriedMedians.toMap)
    // the detailed stage prefers the names form outright when the full
    // form would clip the name list (r16 verdict task 3: the one thing the
    // sealed line must never hide is WHICH queries were re-queried)
    val compositeFullObj =
      compositeJson(compositePerQuery, retriedMedians.toMap, uncleanNames)
    val compositeNamesObj = compositeJson(compositePerQuery,
      retriedMedians.toMap, uncleanNames, detail = "names")
    val compositeObj =
      if (retriedMedians.size > CompositeInlineMax
          || uncleanNames.size > CompositeInlineMax) compositeNamesObj
      else compositeFullObj
    val compositeCountsObj = compositeJson(compositePerQuery,
      retriedMedians.toMap, uncleanNames, detail = "counts")

    val qs = results.map { case (k, v, _, _, _) => s""""$k":$v""" }.mkString("{", ",", "}")
    val qsUntrimmed =
      results.map { case (k, _, u, _, _) => s""""$k":$u""" }.mkString("{", ",", "}")
    // stdout variant: 2-decimal medians (r17; the med5 estimator's
    // trigger-to-trigger noise is well above 10 ms, and the ~30 chars
    // bought across the headline map are part of what lets the
    // requeried-names stage fit the pair budget); the full 3-decimal
    // values stay in target/bench.json
    val qsCompact =
      results.map { case (k, v, _, _, _) => f""""$k":$v%.2f""" }.mkString("{", ",", "}")
    val runsJson = results.map { case (k, _, _, rs, _) =>
      s""""$k":${rs.map(r => f"$r%.3f").mkString("[", ",", "]")}"""
    }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val totalUntrimmed = results.map(_._3).filter(_ >= 0).sum
    // r19 task 2: aligned with the `queries` map's key order (see
    // buildMainLine scaladoc); named map in target/bench.json
    val taskMsArr = results.map(_._5).mkString("[", ",", "]")
    val taskMsByQuery = results.map { case (k, _, _, _, t) => s""""$k":$t""" }
      .mkString("{", ",", "}")

    // Scale evidence: replicate inputs factor× with disjoint key ranges and
    // re-time the two shuffle-heaviest queries. A healthy plan scales
    // near-linearly (ratio ≈ factor); a broadcast flip or skew collapse
    // shows up as a super-linear blowout. Off the driver's correctness path;
    // a NonFatal failure degrades to an explicit error marker (a silently
    // empty section would be indistinguishable from a disabled probe), while
    // fatal errors (OOM, interrupt) still propagate and fail the bench.
    // Probe JSON in two shapes (r10 verdict task 1 — the stdout line had
    // lost its head to the driver's fixed 2000-char tail window for TWO
    // rounds because it embedded the probe's raw runs1/runsN arrays):
    //  - full (file): t1/tN/ratio plus the raw interleaved runs arrays;
    //  - compact (stdout): t1/tN/ratio only, ~50 bytes per workload.
    val (probeFull, probeCompact) =
      if (sys.env.getOrElse("SPARK_GRAFT_SCALE_PROBE", "1") == "0") ("", "")
      else try {
        val factor = sys.env.getOrElse("SPARK_GRAFT_SCALE_FACTOR", "10").toInt
        val probe = ScaleProbe.run(spark, sfDir, factor)
        // full (file): named fields + raw interleaved runs + any
        // spill-bytes metrics; compact (stdout probes line): one
        // [t1, tN, ratio] array per workload — [t1, tN, ratio, spill1,
        // spillN] for legs carrying the spill metric (r14 restructure:
        // array form costs ~19 chars less per entry than named fields,
        // the probes line's share of the stdout budget)
        def entriesFull = probe.map { p =>
          def arr(xs: Seq[Double]) = xs.map(x => f"$x%.3f").mkString("[", ",", "]")
          val spill = (p.spill1, p.spillN) match {
            case (Some(a), Some(b)) => s""","spill1":$a,"spillN":$b"""
            case _ => ""
          }
          f""""${p.name}":{"t1":${p.t1}%.3f,"tN":${p.tN}%.3f,"ratio":${p.ratio}%.2f$spill""" +
            s""","runs1":${arr(p.runs1)},"runsN":${arr(p.runsN)}}"""
        }.mkString(",")
        // stdout timings at 2 decimals (r17): the compact walls are
        // multi-second measurements whose third decimal is noise, and the
        // ~24 chars bought are what lets the main line's requeried-names
        // stage fit the pair budget at r16-like retry counts; the full
        // 3-decimal values stay in target/bench.json
        def entriesCompact = probe.map { p =>
          val spill = (p.spill1, p.spillN) match {
            case (Some(a), Some(b)) => s",$a,$b"
            case _ => ""
          }
          f""""${p.name}":[${p.t1}%.2f,${p.tN}%.2f,${p.ratio}%.2f$spill]"""
        }.mkString(",")
        (s""","scale_probe":{"factor":$factor,"queries":{$entriesFull}}""",
          s""","scale_probe":{"factor":$factor,"queries":{$entriesCompact}}""")
      } catch {
        case scala.util.control.NonFatal(e) =>
          val msg = s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("")}"
            .replaceAll("[\"\\\\\\n\\r\\t]", " ").take(200)
          val j = s""","scale_probe":{"error":"$msg"}"""
          (j, j)
      }

    // Exchange-volume evidence (r11 verdict task 7): the bloom prefilter's
    // whole point is shuffle-record reduction, which the wall-clock
    // headline cannot show at scan-floored sf0.1 — so measure the records
    // directly from the executed plans' own SQLMetrics at factor× data.
    // Deterministic (no timing, no medians): the same plan shuffles the
    // same rows every run.
    // two shapes, like the scale probe: full record counts in the file,
    // cuts-only in the fixed-tail-window stdout line
    val (exchangeFull, exchangeCompact) =
      if (sys.env.getOrElse("SPARK_GRAFT_EXCHANGE_PROBE", "1") == "0") ("", "")
      else try {
        val factor = sys.env.getOrElse("SPARK_GRAFT_SCALE_FACTOR", "10").toInt
        val v = ExchangeProbe.run(spark, sfDir, factor)
        (f""","exchange_probe":{"factor":${v.factor},""" +
          f""""bloom_join":{"records_with":${v.bloomWith},""" +
          f""""records_without":${v.bloomWithout},"cut":${v.bloomCut}%.2f},""" +
          f""""superstep_checkpoint":{"records_preserving":${v.superPreserving},""" +
          f""""records_bare":${v.superBare},"cut":${v.superCut}%.2f},""" +
          f""""skew_balance":{"max_task_records_unsalted":${v.skewMaxUnsalted},""" +
          f""""max_task_records_salted":${v.skewMaxSalted},"balance":${v.skewBalance}%.2f},""" +
          f""""lsh_band":{"candidate_pairs_banded":${v.lshBandedPairs},""" +
          f""""all_pairs":${v.lshAllPairs},"cut":${v.lshCut}%.1f},""" +
          f""""pagerank_contrib":{"max_task_rows_nocombine":${v.prNaiveMax},""" +
          f""""max_task_rows_partial":${v.prPartialMax},"cut":${v.prCombineCut}%.1f,""" +
          f""""max_indeg_1x":${v.prMaxInDeg1},"max_indeg_Nx":${v.prMaxInDegN},""" +
          f""""hub_growth":${v.prHubGrowth}%.2f}}""",
          // compact: cuts only; full record counts live in target/bench.json
          f""","exchange_probe":{"factor":${v.factor},"bloom_cut":${v.bloomCut}%.2f,""" +
            f""""superstep_checkpoint_cut":${v.superCut}%.2f,""" +
            f""""skew_balance":${v.skewBalance}%.2f,"lsh_band_cut":${v.lshCut}%.1f,""" +
            f""""pagerank_contrib_cut":${v.prCombineCut}%.1f,""" +
            f""""pagerank_hub_growth":${v.prHubGrowth}%.2f}""")
      } catch {
        case scala.util.control.NonFatal(e) =>
          val msg = s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("")}"
            .replaceAll("[\"\\\\\\n\\r\\t]", " ").take(200)
          val j = s""","exchange_probe":{"error":"$msg"}"""
          (j, j)
      }

    // second calibration bracket AFTER the probes, then the combined
    // medians: the window's interference index (see calibSpin scaladoc)
    sampleCalib()
    def med(xs: Seq[Double]): Double =
      if (xs.isEmpty) -1.0 else xs.sorted.apply(xs.size / 2)
    def arr(xs: Seq[Double]): String =
      xs.map(x => f"$x%.3f").mkString("[", ",", "]")
    val calibMedians = Map(
      "spin" -> med(spinRuns.toSeq),
      "shuffle" -> med(shuffleRuns.toSeq),
      "scan" -> med(scanRuns.toSeq))
    val calibBrackets = Map(
      "spin" -> Seq(spinRuns.take(bracket1("spin")).toSeq,
        spinRuns.drop(bracket1("spin")).toSeq),
      "shuffle" -> Seq(shuffleRuns.take(bracket1("shuffle")).toSeq,
        shuffleRuns.drop(bracket1("shuffle")).toSeq),
      "scan" -> Seq(scanRuns.take(bracket1("scan")).toSeq,
        scanRuns.drop(bracket1("scan")).toSeq))
    val tainted = taintedJson(taintedLegsBracketed(calibBrackets, calibRefs))
    val calibCompact =
      f""","calib":{"spin":${calibMedians("spin")}%.3f,"shuffle":${calibMedians("shuffle")}%.3f,""" +
        f""""scan":${calibMedians("scan")}%.3f}"""
    val calibFull = {
      def bmeds(k: String) =
        arr(calibBrackets(k).map(med)) // [pre-headline med, post-probes med]
      f""","calib":{"spin":${calibMedians("spin")}%.3f,"shuffle":${calibMedians("shuffle")}%.3f,""" +
        f""""scan":${calibMedians("scan")}%.3f,""" +
        calibRefs.toSeq.sortBy(_._1).map { case (k, v) =>
          f""""${k}_ref":$v%.3f""" }.mkString("", ",", ",") +
        s""""spin_brackets":${bmeds("spin")},"shuffle_brackets":${bmeds("shuffle")},""" +
        s""""scan_brackets":${bmeds("scan")},""" +
        s""""spin_runs":${arr(spinRuns.toSeq)},"shuffle_runs":${arr(shuffleRuns.toSeq)},""" +
        s""""scan_runs":${arr(scanRuns.toSeq)}}"""
    }

    // Two artifacts (r9 task 3 / r10 task 1 history: the one-line record
    // outgrew a fixed ~2000-char tail-capture window twice; r13 closed the
    // window at 1791/1800 — hence the r13-task-2 two-line restructure):
    //  - target/bench.json: the FULL record including per-query and
    //    per-probe raw runs arrays plus the calib references, forensics;
    //  - stdout: the two-line contract documented at assembleStdout — the
    //    probes line, then the MAIN line last.
    // clean-composite forensics for the file record: the full per-query
    // composite map, the per-boundary raw samples, the retry runs, and
    // the human-readable retry log (what got requeued, deferred, or
    // discarded and why)
    val compositeFull = {
      val pq = compositePerQuery.map { case (n, v) => s""""$n":$v""" }
        .mkString("{", ",", "}")
      val rr = retriedRuns.toSeq.sortBy(_._1).map { case (n, rs) =>
        s""""$n":${rs.map(r => f"$r%.3f").mkString("[", ",", "]")}"""
      }.mkString("{", ",", "}")
      val bnd = boundarySamples.zipWithIndex.map { case (b, i) =>
        val legs = b.toSeq.sortBy(_._1).map { case (k, xs) =>
          s""""$k":${arr(xs)}"""
        }.mkString("{", ",", "}")
        s""""b$i":$legs"""
      }.mkString("{", ",", "}")
      val dirtyArr = dirty.toSeq.sorted.mkString("[", ",", "]")
      val logArr = retryLog
        .map(s => "\"" + s.replaceAll("[\"\\\\\\n\\r\\t]", " ") + "\"")
        .mkString("[", ",", "]")
      val rbnd = retryBoundaries.map { case (ci, round, phase, b) =>
        val legs = b.toSeq.sortBy(_._1).map { case (k, xs) =>
          s""""$k":${arr(xs)}"""
        }.mkString(",")
        s"""{"chunk":$ci,"round":$round,"phase":"$phase",$legs}"""
      }.mkString("[", ",", "]")
      s""","composite_clean_full":{"per_query":$pq,"dirty_chunks":$dirtyArr,""" +
        s""""chunk_size":$ChunkSize,"boundaries":$bnd,"retry_runs":$rr,""" +
        s""""retry_boundaries":$rbnd,"retry_log":$logArr}"""
    }
    val full =
      s"""{"metric":"total","value":$total,"unit":"sec","estimator":"med5_trim3xmin",""" +
        s""""cpus":$cpus,"tainted":$tainted,"value_untrimmed":$totalUntrimmed,"queries":$qs,""" +
        s""""queries_untrimmed":$qsUntrimmed,"task_ms":$taskMsArr,""" +
        s""""task_ms_by_query":$taskMsByQuery,$compositeFullObj,"runs":$runsJson,"sf":"$sfDir"""" +
        s"""$calibFull$compositeFull$probeFull$exchangeFull}"""
    val mainLine = buildMainLine(total, tainted, calibCompact, qsCompact,
      compositeObj, sfDir, cpus, taskMsArr)
    val mainLineNames = buildMainLine(total, tainted, calibCompact, qsCompact,
      compositeNamesObj, sfDir, cpus, taskMsArr)
    val mainLineCounts = buildMainLine(total, tainted, calibCompact, qsCompact,
      compositeCountsObj, sfDir, cpus, taskMsArr)
    val probesLine =
      s"""{"graft_probes":true$probeCompact$exchangeCompact}"""
    val stdoutLines = assembleStdout(probesLine, mainLine, mainLineNames, mainLineCounts)
    try {
      new java.io.File("target").mkdirs()
      java.nio.file.Files.writeString(java.nio.file.Paths.get("target/bench.json"), full)
    } catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[bench] could not write target/bench.json: ${e.getMessage}")
    }
    // Emit the (probes, main) pair TWICE — before and after session
    // shutdown — with build.sbt's StdoutOutput making all copies reach the
    // driver as bare, unprefixed stdout (r11 verdict task 1: three rounds
    // of BENCH "parsed": null traced to sbt's "[info] " prefix /
    // "[success]" footer around a line that itself parses cleanly).
    // Whatever the extraction rule — last line, last JSON-looking line, or
    // a tail-window scan — the MAIN record is the final stdout line and an
    // intact (probes, main) pair fits the window (see assembleStdout).
    // DUPLICATE-EMISSION CONTRACT (r12 ADVICE): the two pairs are
    // BYTE-IDENTICAL (one value each, printed twice, nothing mutates
    // between). A consumer that collects ALL JSON-looking stdout lines
    // MUST dedupe identical lines — summing or assert-once rules would
    // double-count this deliberate redundancy.
    stdoutLines.foreach(println)
    spark.stop()
    stdoutLines.foreach(println)
  }
}

/** Replays shuffle-heavy queries on factor×-replicated inputs to show the
  * plans hold as data grows (VERDICT r3 task 6).
  *
  * Measurement design (round-6 investigation): on a large lazily-grown heap
  * (the driver sets -Xmx ≈ 100g) a SINGLE local[32] measurement can read
  * 5-6× high from GC / heap-expansion / cleaner pauses — reproduced on
  * identical code and data: x10 LSH anywhere from 6.1s to 23.8s, and even a
  * 1× point at 9.4s vs its usual 1.6s. A ratio of two such one-shot numbers
  * is noise (round-5's "13.67×" scare; 0.69×-22× observed across reps). So
  * the probe INTERLEAVES the two scale points into pairs — slow JVM drift
  * hits both halves of a pair alike — reports the MEDIAN per-pair ratio,
  * and emits the raw per-run arrays in the bench JSON so run-to-run
  * variance is inspectable instead of hidden behind one scalar.
  *
  * Replication preserves the workload's SHAPE at factor× the rows:
  *
  * - join keys shift by `KeyStride` per replica, so the fact-fact join
  *   fan-out grows linearly (disjoint key ranges), never quadratically;
  * - document text gets a per-replica token injected between every word,
  *   so every shingle differs across replicas: LSH near-dup pairs stay
  *   within-replica and the pair count scales exactly linearly (clones
  *   colliding across replicas would be quadratic in the factor);
  * - the 1× baseline is re-written through the same temp-parquet path as
  *   the N× copy, so both timings see identical codec/locality.
  */
object ScaleProbe {

  /** One probed query: the representative (t1, tN) pair, its ratio, and the
    * raw interleaved runs behind them.
    *
    * Estimator (r10 verdict task 2): t1, tN, and ratio all come from ONE
    * pair — the median-ratio pair after trimming interference-polluted
    * pairs — so the three displayed numbers are self-consistent
    * (tN / t1 == ratio exactly). r10 had reported per-side minima next to a
    * median-pair ratio, which disagreed by up to 60% when a 17-62s machine
    * pause landed in one run (q_dedup_cc read t1 2.423 / tN 5.452 = 2.25×
    * beside ratio 3.60×). A pair is "polluted" when either element exceeds
    * 3× that side's minimum across all pairs (the observed pauses are
    * 5-25× swings, well past 3×, while genuine run-to-run variance on this
    * box stays within ~1.5×); if trimming would discard everything, the
    * untrimmed set is used (the min pair always survives the filter, so
    * this fallback is only reachable when every pair is polluted on the
    * OTHER side simultaneously).
    */
  final case class ProbePoint(name: String, t1: Double, tN: Double,
      ratio: Double, runs1: Seq[Double], runsN: Seq[Double],
      spill1: Option[Long] = None, spillN: Option[Long] = None)

  private val KeyStride = 100000000L // > any key at the bench scale factors

  private[graft] def replicate(spark: SparkSession, sfDir: String, name: String,
      factor: Int): DataFrame = {
    val base = Graft.table(spark, sfDir, name)
    // Dimension tables (nation, region, part, supplier, …) pass through as
    // ONE copy at any factor — that is the 100 TB reality the probe models
    // (facts grow, dims do not), and unioning factor identical copies
    // would wrongly multiply every dim join's fan-out.
    val growable = Set("customer", "orders", "lineitem", "documents",
      "embeddings", "events")
    if (!growable(name)) return base
    val copies = (0 until factor).map { i =>
      val off = i * KeyStride
      name match {
        case "customer" =>
          base.withColumn("c_custkey", col("c_custkey") + off)
        case "orders" =>
          base.withColumn("o_orderkey", col("o_orderkey") + off)
            .withColumn("o_custkey", col("o_custkey") + off)
        case "lineitem" =>
          base.withColumn("l_orderkey", col("l_orderkey") + off)
        case "documents" =>
          base.withColumn("doc_id", col("doc_id") + off)
            .withColumn("text", regexp_replace(col("text"), lit("\\s+"), lit(s" r$i ")))
        case "events" =>
          // more USERS over the same time range (the realistic growth
          // axis): per-user history length stays fixed, keyed operators
          // must scale in user count
          base.withColumn("event_id", col("event_id") + off)
            .withColumn("user_id", col("user_id") + off)
        case _ =>
          base.withColumn("vec_id", col("vec_id") + off)
      }
    }
    copies.reduce(_ union _)
  }

  /** One probe workload: display name, replicated input tables it needs,
    * plan builder from a data directory, and session-conf overrides applied
    * (and restored) around its runs.
    */
  private final case class ProbeWork(name: String, tables: Seq[String],
      build: String => DataFrame, conf: Map[String, String] = Map.empty,
      // r13 verdict task 5: record the interval join's spillSize SQLMetric
      // at both scale points (one extra run each, outside the timed pairs)
      spillMetric: Boolean = false)

  /** The skew pair's shared workload — the q_join_salted_skew key shape
    * (even l_orderkey → key 0, so ~50% of rows share one join key; bounded
    * ≤998-key space so the dim side honors saltedJoin's small-right
    * contract), built salted or unsalted, then a per-row enrich-and-score
    * kernel (sha2 digest over dim attr + row ids — the standard
    * join-a-feature-dim-then-score shape). The scoring runs in the
    * post-shuffle join stage, so the unsalted leg serializes ~50% of all
    * per-row work through ONE reducer while the salted leg spreads it over
    * 16 — without it, at bench scale the hot task's merge work is too cheap
    * to rise above the probe's fixed overheads (measured r9: the plain-join
    * pair timed salted 2.2s vs unsalted 1.5s at 10×, pure noise).
    * Probed with broadcast and AQE skew mitigation disabled on BOTH legs so
    * the measured delta is salting alone: the utility exists for skew the
    * optimizer cannot see (post-transform keys) or cannot rescue
    * (non-sort-merge plans), and without the overrides the tiny dim side
    * would broadcast and hide the hot reducer entirely.
    */
  private def skewWorkload(spark: SparkSession, dir: String, salted: Boolean): DataFrame = {
    val left = Graft.table(spark, dir, "lineitem").select(
      when(col("l_orderkey") % 2 === 0, lit(0L))
        .otherwise(lit(1L) + col("l_orderkey") % 997).as("k"),
      col("l_orderkey"), col("l_linenumber"))
    val dim = left.select(col("k")).distinct()
      .withColumn("attr", sha2(col("k").cast("string"), 256))
    val joined =
      if (salted) graft.operators.Partitioning.saltedJoin(left, dim, "k",
        saltBuckets = 16, saltFrom = Seq("l_orderkey", "l_linenumber"))
      else left.join(dim, "k")
    joined
      .select((col("k") % 97).as("grp"),
        sha2(concat_ws(":", col("attr"), col("l_orderkey"), col("l_linenumber")), 256)
          .as("h"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), max(col("h")).as("hmax"))
  }

  /** The forced-spill interval-join leg's synthetic inputs (r13 verdict
    * task 5): the spill store's scale behavior had A/B coverage but no
    * round-over-round probe, because the catalog twins' depth is physics
    * and never crosses the in-memory thresholds at probe SFs. This leg
    * FORCES the spill regime (`inMemoryRows`=16 via the work's conf) on
    * the FdProbe shape scaled linearly in KEYS:
    *
    *  - per key, `perKey` rights at stride 10; even rights effectively
    *    never expire (hi = lo + 1e6 — the active set grows toward
    *    perKey/2 ≫ 16, all row bytes on disk), odd rights live 50 units
    *    (they evict as the sweep advances, creating dead file ranges so
    *    the leg also exercises amortized compaction via the lowered
    *    `compactMinBytes`);
    *  - sawtooth lefts: every other left reads 1500 units forward (a
    *    positional-read burst over the spilled prefix), the rest 5 units
    *    (abandoned short prefixes — the exact pattern that leaked under
    *    the discarded EAUA draft, see FdProbe);
    *  - 1× = `keys` keys, N× = factor×keys — per-key depth (the spill
    *    regime's working set) stays CONSTANT while rows and output grow
    *    linearly, so the time ratio must track the factor like every
    *    other probe leg and the spillSize metric is a pure function of
    *    the data (bit-stable across runs; drift = a real change in the
    *    store's I/O pattern).
    */
  private[graft] def sawtoothIntervals(spark: SparkSession, keys: Int, perKey: Int): (DataFrame, DataFrame) = {
    // `div`, not `/`: Spark's `/` on longs is DOUBLE division — a
    // fractional key would make every group ~1 row deep and nothing
    // would ever spill
    val l = spark.range(keys.toLong * perKey).select(
      expr(s"id div $perKey").as("k"),
      ((col("id") % perKey) * 10).as("lo"),
      (col("id") % 2).as("par"))
      .withColumn("hi",
        when(col("par") === 0, col("lo") + 1500L).otherwise(col("lo") + 5L))
      .drop("par")
    val r = spark.range(keys.toLong * perKey).select(
      expr(s"id div $perKey").as("k2"),
      ((col("id") % perKey) * 10).as("lo2"),
      (col("id") % 2).as("par"))
      .withColumn("hi2",
        when(col("par") === 0, col("lo2") + 1000000L).otherwise(col("lo2") + 50L))
      .drop("par")
    (l, r)
  }

  // sized so the 10× point costs ~2s (the leg runs 12 times per bench):
  // depth reaches perKey/2 persistent intervals ≫ the forced
  // inMemoryRows=16, every output row in the spill regime is one
  // positional read, and spillSize stays a pure function of the data
  private[graft] val SpillLegKeys = 16
  private[graft] val SpillLegPerKey = 250

  /** Run `df` and sum the `spillSize` SQLMetric across every
    * IntervalJoinExec in ITS OWN executed plan (same metric-read shape as
    * [[ExchangeProbe.shuffleRecords]] — the action must be on df's own
    * QueryExecution or the metrics stay zero).
    */
  private[graft] def intervalSpillBytes(df: DataFrame): Long = {
    df.queryExecution.toRdd.count()
    ExchangeProbe.flattenPlan(df.queryExecution.executedPlan).map {
      case e: graft.plans.IntervalJoinExec => e.metrics("spillSize").value
      case _ => 0L
    }.sum
  }

  /** Probe each workload at 1× and factor× (see measurement-design scaladoc
    * above: interleaved pairs, median ratio, raw runs retained).
    */
  def run(spark: SparkSession, sfDir: String, factor: Int): Seq[ProbePoint] = {
    def catalogWork(name: String, tables: String*) = ProbeWork(name, tables,
      dir => AllQueries.all(name).run(Tables(spark, dir)))
    val skewConf = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "false")
    val works: Seq[ProbeWork] =
      Seq(
        catalogWork("q_join_inner", "customer", "orders", "lineitem"),
        catalogWork("q_dedup_lsh_pairs", "documents"),
        // The only driver-iterative headline query (Lloyd's rounds collect
        // k·d centroid sums per iteration): probing it at factor× pins the
        // scaladoc claim that the driver collect is CONSTANT in corpus size
        // and the map-side assignment scales linearly — a regression that
        // made driver state grow with the data would show up here as a
        // superlinear ratio (r8 verdict task 3).
        catalogWork("q_sim_kmeans", "embeddings"),
        // Pregel-shaped superstep iteration (the graph sibling of the CC
        // probe): per superstep only the O(nodes) rank table reshuffles,
        // edges stay checkpointed — a regression that reshuffled edges
        // per round would surface as a superlinear ratio here. Replicated
        // lineitem offsets orderkeys but shares partkeys, so edges grow
        // linearly-in-factor while part-node degrees densify — the harder
        // (skewed-growth) version of the linearity claim.
        catalogWork("q_graph_pagerank", "lineitem"),
        // d²-bounded-exchange claim (r9): the covariance pair expansion is
        // two chained generators — per-row work scales with the corpus but
        // the ONLY shuffle carries d² partial groups regardless of n, so
        // the factor× ratio must stay ~linear-in-data. A regression that
        // reintroduced the per-vector self-join would shuffle the n·d
        // exploded relation and bend this curve superlinear once the
        // join side outgrows broadcast.
        catalogWork("q_sim_covariance", "embeddings"),
        // Deep-join anchor at factor× (r9 verdict task 6): the five-table
        // star (lineitem⋈orders⋈customer + broadcast nation⋈region). All
        // three fact-side tables replicate with aligned disjoint key
        // offsets, so both fact-fact joins fan out linearly while the dims
        // (listed so the probe dir carries them, copied once at any
        // factor) stay fixed — exactly the broadcast-vs-SMJ flip surface
        // the probe exists to catch: a plan that re-broadcast a grown side
        // or re-shuffled a dim would bend this ratio superlinear.
        catalogWork("q_join_star", "customer", "orders", "lineitem",
          "nation", "region"),
        // the native as-of exec at factor×: user count grows, per-user
        // history stays fixed — the key-partitioned one-pointer merge must
        // scale linearly in users (a regression to a buffered or
        // re-shuffled form would bend this curve)
        catalogWork("q_join_asof_native", "events"),
        // the native plane-sweep interval join at factor× (r11's second
        // whole-operator exec): same growth axis as the as-of probe — more
        // users, fixed per-user interval depth — so the sweep's active-set
        // bound stays constant and the ratio must track the data linearly;
        // a regression toward the composed range-predicate join (per-key
        // quadratic) or a sweep that stopped pruning its active set would
        // bend this curve superlinear.
        catalogWork("q_join_interval_keyed_native", "events")) ++
      // Iterative-operator scale point (LSH pairs → log-round star
      // contraction): the most expensive headline query and the only
      // iterative one, so its growth curve belongs in the shipped bench
      // (r7 verdict task 6). On by default since r8 — two full bench rounds
      // (r6/r7) showed the probe's wall-time fits the driver's budget;
      // disable locally with SPARK_GRAFT_PROBE_CC=0 for quick iterations.
      (if (sys.env.getOrElse("SPARK_GRAFT_PROBE_CC", "1") == "1")
        Seq(catalogWork("q_dedup_cc", "documents"))
      else Seq.empty) ++
      // Salted-vs-unsalted on a 50%-hot key (r8 verdict task 6): the
      // unsalted leg's N× point serializes the hot key through one reducer
      // while the salted leg spreads it over 16 — the entries pin that the
      // salted plan's growth ratio stays below the unsalted one on skew.
      // Disable locally with SPARK_GRAFT_PROBE_SKEW=0.
      (if (sys.env.getOrElse("SPARK_GRAFT_PROBE_SKEW", "1") == "1") Seq(
        ProbeWork("skew_join_salted", Seq("lineitem"),
          dir => skewWorkload(spark, dir, salted = true), skewConf),
        ProbeWork("skew_join_unsalted", Seq("lineitem"),
          dir => skewWorkload(spark, dir, salted = false), skewConf))
      else Seq.empty) ++
      // Forced-spill interval-join leg (r13 verdict task 5) — see
      // sawtoothIntervals scaladoc. Disable with SPARK_GRAFT_PROBE_SPILL=0.
      (if (sys.env.getOrElse("SPARK_GRAFT_PROBE_SPILL", "1") == "1") Seq(
        ProbeWork("interval_spill_forced", Seq.empty,
          dir => {
            val l = spark.read.parquet(s"$dir/sawtooth_l.parquet")
            val r = spark.read.parquet(s"$dir/sawtooth_r.parquet")
            graft.plans.NativeIntervalJoin.overlap(
              l, r, "k", "lo", "hi", "k2", "lo2", "hi2")
          },
          conf = Map(
            graft.plans.IntervalJoinExec.InMemoryRowsKey -> "16",
            graft.plans.IntervalJoinExec.CompactMinBytesKey -> "4096"),
          spillMetric = true))
      else Seq.empty)
    // local-iteration knob: SPARK_GRAFT_PROBE_ONLY=<regex> probes just the
    // matching workloads (e.g. "skew_.*") without waiting on the rest
    val selected = sys.env.get("SPARK_GRAFT_PROBE_ONLY")
      .fold(works)(rx => works.filter(_.name.matches(rx)))
    val root = java.nio.file.Files.createTempDirectory("graft-scale").toString
    try {
      val allTables = selected.flatMap(_.tables).distinct
      for (f <- Seq(1, factor); t <- allTables)
        replicate(spark, sfDir, t, f).write.mode("overwrite")
          .parquet(s"$root/x$f/$t.parquet")
      // the spill leg's synthetic inputs go through the same temp-parquet
      // path as the replicated catalog tables (identical codec/locality
      // at both scale points)
      if (selected.exists(_.spillMetric))
        for (f <- Seq(1, factor)) {
          val (l, r) = sawtoothIntervals(spark, SpillLegKeys * f, SpillLegPerKey)
          l.write.mode("overwrite").parquet(s"$root/x$f/sawtooth_l.parquet")
          r.write.mode("overwrite").parquet(s"$root/x$f/sawtooth_r.parquet")
        }
      // same accumulator keep-alive as the headline loop: pin each run's
      // DataFrame (and so its SQL-metric accumulators) until a full query
      // after its forced-GC boundary — see Bench.quiesce scaladoc
      val gen = new scala.collection.mutable.ArrayBuffer[DataFrame]()
      var prevGen: List[DataFrame] = Nil
      def once(w: ProbeWork, dir: String): Double = {
        val t0 = System.nanoTime() // before construction — see runOnce note
        val df = w.build(dir)
        df.write.format("noop").mode("overwrite").save()
        val t = (System.nanoTime() - t0) / 1e9
        gen += df
        t
      }
      selected.sortBy(_.name).flatMap { w =>
        prevGen = gen.toList; gen.clear()
        val saved = w.conf.keys.map(k => k -> spark.conf.getOption(k)).toMap
        w.conf.foreach { case (k, v) => spark.conf.set(k, v) }
        try {
          // warm both scale points (file listing, codegen for each dataset's
          // plan), flush the warmup's allocation debt, then time 5
          // interleaved (1×, N×) pairs — observed pauses last 15-20s and hit
          // single runs at random, so a 5-sample median is the cheapest
          // estimator that survives two polluted pairs.
          once(w, s"$root/x1"); once(w, s"$root/x$factor")
          Bench.quiesce(spark)
          System.gc()
          val pairs = Seq.fill(5)((once(w, s"$root/x1"), once(w, s"$root/x$factor")))
          // trimmed median-pair estimator — see ProbePoint scaladoc
          val min1 = pairs.map(_._1).min
          val minN = pairs.map(_._2).min
          val clean = pairs.filter { case (a, b) => a <= 3 * min1 && b <= 3 * minN }
          val usable = if (clean.nonEmpty) clean else pairs
          val (t1, tN) = usable.sortBy { case (a, b) => b / a }.apply(usable.size / 2)
          // spill metric runs OUTSIDE the timed pairs (metric reads need
          // the action on the df's own QueryExecution, not the noop path)
          val (sp1, spN) =
            if (w.spillMetric)
              (Some(intervalSpillBytes(w.build(s"$root/x1"))),
                Some(intervalSpillBytes(w.build(s"$root/x$factor"))))
            else (None, None)
          Some(ProbePoint(w.name, t1, tN, tN / t1,
            pairs.map(_._1), pairs.map(_._2), sp1, spN))
        } catch {
          // One broken workload must not erase the other probes' evidence
          // (the r10 lesson: a missing probe-dir table zeroed the WHOLE
          // section) — degrade to a visible stderr marker and keep going.
          case scala.util.control.NonFatal(e) =>
            System.err.println(s"[probe] ${w.name} failed: ${e.getMessage}")
            None
        } finally w.conf.keys.foreach { k =>
          saved(k).fold(spark.conf.unset(k))(spark.conf.set(k, _))
        }
      }
    } finally {
      scala.reflect.io.Path(new java.io.File(root)).deleteRecursively()
      ()
    }
  }
}

/** Shuffle-record evidence for the two exchange-volume levers the
  * wall-clock headline cannot see at scan-floored test SFs (r11 verdict
  * task 7). The metric is the sum of every ShuffleExchange's own
  * `shuffleRecordsWritten` SQLMetric in the executed plan — rows entering
  * exchanges, the quantity both operators exist to cut — which unlike
  * wall-clock is deterministic at any SF.
  *
  *  - `bloom_join`: the same fact⋈dim shuffle join with and without the
  *    explicit bloom prefilter, broadcast and Spark's own runtime bloom
  *    injection disabled on BOTH legs so the delta is the operator alone.
  *    Expected shape: the dim predicate keeps ~1/5 of suppliers, so the
  *    prefiltered fact exchange carries ~20% + fpp of the rows — a ~5×
  *    cut that holds at ANY factor because the bloom rides a scalar
  *    subquery (one build, a literal in every task).
  *  - `superstep_checkpoint`: one PageRank-shaped consuming join (edges ⋈
  *    ranks → contribution sum) over a key-checkpointed edge set, built
  *    with Checkpoints.partitioned vs a bare
  *    `repartition(n, key).localCheckpoint(true)`. The bare leg is the
  *    r11-discovered AQE defect in vivo — the checkpoint forgets its hash
  *    layout, so the join re-exchanges ALL edges; the preserving leg's
  *    join shuffles only the rank side. The record delta is exactly the
  *    per-superstep edge re-shuffle the fix removes, and it compounds K×
  *    over a K-round algorithm.
  */
object ExchangeProbe {
  import org.apache.spark.sql.execution.SparkPlan
  import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
  import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike

  final case class Volumes(factor: Int, bloomWith: Long, bloomWithout: Long,
      superPreserving: Long, superBare: Long,
      skewMaxUnsalted: Long, skewMaxSalted: Long,
      lshBandedPairs: Long, lshAllPairs: Long,
      prNaiveMax: Long, prPartialMax: Long,
      prMaxInDeg1: Long, prMaxInDegN: Long) {
    private def ratio(num: Long, den: Long): Double =
      num.toDouble / math.max(den, 1L).toDouble
    def bloomCut: Double = ratio(bloomWithout, bloomWith)
    def superCut: Double = ratio(superBare, superPreserving)
    /** hot-task load ratio: rows the busiest reduce partition receives
      * without vs with salting — the record-exact twin of the skew probe's
      * wall-clock ratio (r12 verdict task 4a). */
    def skewBalance: Double = ratio(skewMaxUnsalted, skewMaxSalted)
    /** Σ|bucket|²-vs-all-pairs cut: candidate pairs the band join
      * generates vs the n·(n−1)/2 a blocking-free near-dup pass would
      * compare (r12 verdict task 4b). */
    def lshCut: Double = ratio(lshAllPairs, lshBandedPairs)
    /** PageRank contribution-aggregation skew (r13 verdict task 1): rows
      * the busiest reduce task would receive WITHOUT map-side combine vs
      * the rows it receives under the partial-agg plan Spark actually
      * runs — the record-exact answer to "does the hub dst need salted
      * two-level aggregation", since partial aggregation IS two-level
      * (each hub's sum collapses to ≤ one row per map partition before
      * the exchange). */
    def prCombineCut: Double = ratio(prNaiveMax, prPartialMax)
    /** Densification evidence: the max per-dst in-degree's growth from 1×
      * to factor× (replicated orderkeys share partkeys, so part-node
      * degrees grow with the factor — the stated cause of the pagerank
      * time ratio's superlinearity, now in records). */
    def prHubGrowth: Double = ratio(prMaxInDegN, prMaxInDeg1)
  }

  private[graft] def flattenPlan(p: SparkPlan): Seq[SparkPlan] = {
    val below = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case other => other.children
    }
    p +: below.flatMap(flattenPlan)
  }

  /** Fully run `df` and sum shuffle records written across every exchange
    * in ITS OWN executed plan (metric values are final once the action
    * returns — accumulators merge on task completion, before the job
    * unblocks). The action is `toRdd.count()` on df's own QueryExecution,
    * NOT a noop write: `df.write` plans a fresh QueryExecution whose exec
    * nodes own fresh metric accumulators, and this plan's metrics would
    * stay zero.
    */
  private[graft] def shuffleRecords(df: DataFrame): Long = {
    df.queryExecution.toRdd.count()
    flattenPlan(df.queryExecution.executedPlan).map {
      case s: ShuffleExchangeLike =>
        s.metrics.get("shuffleRecordsWritten").map(_.value).getOrElse(0L)
      case _ => 0L
    }.sum
  }

  /** Rows landing on the BUSIEST post-exchange partition of `df`'s own
    * plan — the hot-task load a skewed key concentrates. Deterministic:
    * hash partitioning over fixed data with a fixed partition count maps
    * the same row to the same reducer every run.
    */
  private[graft] def maxPartitionRows(df: DataFrame): Long =
    df.queryExecution.toRdd
      .mapPartitions(it => Iterator.single(it.size.toLong))
      .fold(0L)(math.max)

  def run(spark: SparkSession, sfDir: String, factor: Int): Volumes = {
    val overrides = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "false")
    val saved = overrides.keys.map(k => k -> spark.conf.getOption(k)).toMap
    overrides.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // facts grow factor×, the dim stays fixed — the 100 TB reality
      val fact = ScaleProbe.replicate(spark, sfDir, "lineitem", factor)
      val dim = Graft.table(spark, sfDir, "supplier")
        .filter(col("s_nationkey") % 5 === 3)
        .select(col("s_suppkey"), col("s_name"))
      def joined(f: DataFrame): DataFrame =
        f.join(dim, col("l_suppkey") === col("s_suppkey"))
          .select(col("l_suppkey"), col("s_name"), col("l_extendedprice"))
      val bloomWithout = shuffleRecords(joined(fact))
      val prefiltered = graft.operators.BloomPrefilter.prefilter(
        fact, "l_suppkey", dim.select(col("s_suppkey")), expectedItems = 10000L)
      val bloomWith = shuffleRecords(joined(prefiltered))

      // superstep leg: both checkpoints materialize OUTSIDE the measured
      // query (identical build shuffles either way); the measured plan is
      // one consuming join+aggregate over the checkpoint scan
      val n = spark.conf.get("spark.sql.shuffle.partitions").toInt
      val edges = fact.select(col("l_orderkey").as("src"), col("l_partkey").as("dst"))
      val ranks = edges.select(col("src").as("node")).distinct()
        .withColumn("rank", lit(1.0))
      val cpEdges = graft.operators.Checkpoints.partitioned(edges, col("src"))
      def consuming(cp: DataFrame): DataFrame =
        cp.join(ranks, col("src") === col("node"))
          .groupBy(col("dst")).agg(sum(col("rank")).as("contrib"))
      val superPreserving = shuffleRecords(consuming(cpEdges))
      val superBare = shuffleRecords(consuming(
        edges.repartition(n, col("src")).localCheckpoint(true)))

      // PageRank contribution-skew leg (r13 verdict task 1): the per-dst
      // contribution groupBy was the one aggregation without a
      // record-exact skew probe, and the 10× scale ratio (the suite's
      // worst) needed adjudication between "hub reducer melting" and
      // "data densification". Two busiest-reduce-task measurements over
      // the SAME contribution relation at factor×:
      //  - nocombine: rows hash-partitioned raw by dst — what the
      //    exchange would carry if the sum were NOT partially aggregated
      //    (equivalently, what a one-level agg over a combine-less
      //    operator would serialize through the hub's reducer);
      //  - partial: distinct (map-partition, dst) pairs by dst — exactly
      //    the rows the partial-agg exchange carries (each map partition
      //    emits at most one partial sum per dst), i.e. the plan Spark
      //    ACTUALLY runs. Partial aggregation IS the salted two-level
      //    rewrite for an algebraic sum — the hub's per-reducer load is
      //    capped at #map-partitions rows regardless of in-degree — so a
      //    material nocombine/partial cut is the record-exact proof that
      //    no explicit salting stage is needed (and a ~1× cut would have
      //    been the signal to ship one).
      // Both are deterministic row counts (hash placement of fixed data),
      // like every other leg here.
      val contribs = cpEdges.join(ranks, col("src") === col("node")).select(col("dst"))
      val prNaiveMax = maxPartitionRows(contribs.repartition(n, col("dst")))
      val prPartialMax = maxPartitionRows(
        contribs.withColumn("pid", spark_partition_id()).distinct()
          .repartition(n, col("dst")))
      // densification evidence: max per-dst in-degree at 1× vs factor×
      // (scalar-bounded collect — one MAX row)
      def maxInDeg(e: DataFrame): Long =
        e.groupBy(col("dst")).agg(count(lit(1)).as("c"))
          .agg(max(col("c")).as("m")).collect()(0).getLong(0)
      val prMaxInDeg1 = maxInDeg(
        Graft.table(spark, sfDir, "lineitem")
          .select(col("l_orderkey").as("src"), col("l_partkey").as("dst")))
      val prMaxInDegN = maxInDeg(edges)

      // skew leg (r12 verdict task 4a): the record-exact twin of the
      // wall-clock skew probe — rows the BUSIEST reduce partition receives
      // in the join exchange, salted vs unsalted, on the same 50%-hot key
      // shape skewWorkload times (even l_orderkey → key 0). Unsalted, the
      // hot key's entire volume serializes through one reducer; salted,
      // it spreads over 16 buckets. Explicit-numPartitions repartition is
      // exactly the exchange the shuffled join performs on its fact side
      // (and is never AQE-coalesced), so the max-partition row count IS
      // the hot task's load, with no timing in sight.
      val skewLeft = fact.select(
        when(col("l_orderkey") % 2 === 0, lit(0L))
          .otherwise(lit(1L) + col("l_orderkey") % 997).as("k"),
        col("l_orderkey"), col("l_linenumber"))
      val skewMaxUnsalted = maxPartitionRows(skewLeft.repartition(n, col("k")))
      val skewMaxSalted = maxPartitionRows(
        skewLeft
          .withColumn("__salt", graft.operators.Partitioning.salt(16,
            col("l_orderkey"), col("l_linenumber")))
          .repartition(n, col("k"), col("__salt")))

      // LSH banding leg (r12 verdict task 4b): the Σ|bucket|² claim as a
      // number — candidate pairs the band equi-join GENERATES (Σ over
      // (band, bucket) groups of |g|·(|g|−1)/2, the exact pre-distinct
      // join fan-out of Dedup.lshNearDupPairs' candidate stage, computed
      // here by aggregation) vs the n·(n−1)/2 pairs a blocking-free
      // near-dup pass would have to compare. Same replicated corpus as
      // the scale probe (per-replica token injection keeps near-dups
      // within-replica), same shingle→minhash→band derivation as the
      // shipped operator.
      val docs = ScaleProbe.replicate(spark, sfDir, "documents", factor)
      val bands = docs
        .select(col("doc_id"),
          graft.operators.Dedup.tokenHashesFromText(col("text")).as("__th"))
        .select(col("doc_id"),
          graft.operators.Dedup.shingleHashesFromTokenHashes(col("__th"), 3).as("shd"))
        .select(col("doc_id"),
          explode(graft.operators.Dedup.lshBandKeys(
            graft.operators.Dedup.minhashSignature(col("shd")))).as("band_key"))
      val lshBandedPairs = bands
        .groupBy(col("band_key")).agg(count(lit(1)).as("c"))
        // DIV keeps the arithmetic integral end-to-end (c·(c−1) is even)
        .agg(sum(expr("c * (c - 1) DIV 2")).as("pairs"))
        .collect()(0).getLong(0)
      val nDocs = docs.count()
      val lshAllPairs = nDocs * (nDocs - 1) / 2

      Volumes(factor, bloomWith, bloomWithout, superPreserving, superBare,
        skewMaxUnsalted, skewMaxSalted, lshBandedPairs, lshAllPairs,
        prNaiveMax, prPartialMax, prMaxInDeg1, prMaxInDegN)
    } finally saved.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }
}
