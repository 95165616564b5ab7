package graft.tools
import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession
import graft.Tables
import graft.operators.Similarity

/** Scratch A/B harness for the current perf question (contents change per
  * round; prior rounds' measurements live in git history — r10 Hilbert
  * fusion 2.5×, r11-1 as-of reconciliation: bare composed 0.696 s vs bare
  * native 0.487 s = 1.43×, catalog twins at parity because the shared
  * global orderBy floors them).
  *
  * r11-2: the fused vector kernels ([[graft.functions.VectorKernels]])
  * versus the composed HOF folds they replace, on the full 2000×2000
  * all-pairs scoring grid at sf0.1 (64-dim embeddings, 4M pairs — the
  * per-pair scoring loop dominates; a cheap per-qid aggregate consumes the
  * scores so no window sort pollutes the measurement).
  *
  * r11 RESULT (sf0.1, local[32], medians of 5):
  *   cosine-composed  69.842 s  vs  cosine-native  1.007 s  → **69×**
  *   intdot-composed  23.998 s  vs  intdot-native  0.953 s  → **25×**
  * The HOF forms pay three interpreted fold trees per pair — `zip_with`
  * materializes an intermediate array, `aggregate` walks it through a
  * lambda tree, and `cosine` does that three times (dot + both norms) —
  * while the kernels run one fused primitive loop inside whole-stage
  * codegen. The magnitude moved the decision: every per-PAIR scoring path
  * in [[Similarity]] now routes through the kernels (bit-parity proven by
  * VectorKernelSpec, so the composed-form oracles still gate them);
  * the composed `cosine`/`intDot` remain as the per-VECTOR forms (norms,
  * self-dots — linear work where interpretation cost is irrelevant) and
  * as the documented reference semantics.
  *
  * r11-5 RESULT (same estimator): top-k-per-group forms at 20M rows /
  * 8 groups / k=3 — window rank filter (WITH its WindowGroupLimit
  * pushdown, fence-verified) 1.219 s vs typed heap Aggregator 0.427 s =
  * **2.9× for the UDAF**: even limit-capped, the window form pays a
  * per-partition sort, an exchange of k·groups·partitions rows, and a
  * final sort, while the Aggregator is one hash aggregate whose reduce
  * rejects in O(1). Guidance recorded on [[graft.operators.TopKAggregator]]:
  * prefer the Aggregator for huge-group/small-k programmatic top-k; the
  * window form remains what SQL surfaces, hence the plan fence.
  *
  * r11-4 RESULT (same estimator): (a) KMV vs exact countDistinct, 20M
  * rows / 5M distinct / 8 groups: exact 1.153 s vs KMV(k=256) 1.136 s —
  * wall parity at local[32] (the win is shuffle volume: ≤ k longs per
  * group-partition vs every distinct pair); the List→Vector bottomK fix
  * took KMV from ~2.1 s to this. (b) NFC kernel: no-normalize floor
  * 0.218 s, ascii-bypass 0.169 s, full-normalize path 0.254 s — the
  * bypass makes normalization free on ASCII corpora (within noise of,
  * here below, the floor), and even the full Normalizer walk costs < 35%
  * over floor at 2M × 80-char strings. (c) Honest addendum: the Scala-UDF
  * alternative measures 0.192 s on the same ASCII input — only ~12%
  * behind the kernel at this string size, because `Normalizer.normalize`
  * has its own cheap ASCII scan; the kernel's real advantages are
  * allocation-free bytes-only rejection (no UTF-8 decode, no boxed
  * String) and staying inside WholeStageCodegen, which matter as string
  * length and surrounding expression fusion grow, not a 10× headline.
  */
object AbBench {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t = Tables(spark, sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    // the headline estimator (Bench.runOnce shape): t0 before plan
    // construction, noop-sink write, warmup + quiesce + GC, 5 runs, median
    val only = args.toSet // substring filters: run only matching sections
    def run(name: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      if (only.nonEmpty && !only.exists(name.contains)) return
      def once(): Double = {
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warm
      graft.Bench.quiesce(spark)
      System.gc()
      val times = Seq.fill(5)(once()).sorted
      println(f"[ab] $name%-28s ${times(2)}%.3f s (median of 5: ${times.map(x => f"$x%.3f").mkString(", ")})")
    }

    def emb = t.embeddings.select(col("vec_id").as("id"),
      Similarity.toDouble(col("embedding")).as("vec"))
    def doublePairs = emb.select(col("id").as("qid"), col("vec").as("qv"))
      .crossJoin(broadcast(emb.select(col("id").as("cid"), col("vec").as("cv"))))
    def quant = emb.withColumn("__ma", Similarity.maxAbs(col("vec")))
      .select(col("id"), Similarity.quantize(col("vec"), col("__ma")).as("qv"))
    def longPairs = quant.select(col("id").as("qid"), col("qv").as("qa"))
      .crossJoin(broadcast(quant.select(col("id").as("cid"), col("qv").as("qb"))))

    def consume(df: org.apache.spark.sql.DataFrame, score: org.apache.spark.sql.Column) =
      df.withColumn("s", score).groupBy(col("qid")).agg(sum(col("s")).as("t"), max(col("s")).as("m"))

    run("cosine-composed") {
      consume(doublePairs, Similarity.cosine(col("qv"), col("cv")))
    }
    run("cosine-native") {
      consume(doublePairs, Similarity.cosineNative(col("qv"), col("cv")))
    }
    run("intdot-composed") {
      consume(longPairs, Similarity.intDot(col("qa"), col("qb")))
    }
    run("intdot-native") {
      consume(longPairs, graft.functions.DotProductLongExpression.column(col("qa"), col("qb")))
    }

    // r11-3: the plane-sweep IntervalJoinExec vs the composed equi-join +
    // overlap conjunction, on the shape that separates them — ONE hot key
    // with 100k intervals per side, sparse overlap. The composed form
    // evaluates the range predicate against every key-group pair (10¹⁰
    // here — codegen burns ~3·10⁹ evals/s, so it finishes, but the cost is
    // GROUP SIZE SQUARED); the sweep's active set stays near-empty and its
    // cost is output-sized. The catalog twins (q_join_interval_keyed
    // [_native], ~150-400 rows/key) sit at parity — scan+agg floored — by
    // construction; THIS is the operator number.
    // r11 RESULT (sf-independent synthetic, local[32], medians of 5):
    //   interval-composed-hotkey  3.135 s  vs  interval-native-hotkey
    //   0.363 s → **8.6× at 100k/side**, quadratic-vs-linear beyond (at
    //   20k/side the grid still fits the eval budget: 0.360 vs 0.196 s).
    def hot(prefix: String) = spark.range(100000)
      .select(lit(1L).as(s"${prefix}k"),
        (col("id") * 97 % 1000000).as(s"${prefix}lo"))
      .withColumn(s"${prefix}hi", col(s"${prefix}lo") + 20)
    run("interval-composed-hotkey") {
      hot("l").join(hot("r"),
          col("lk") === col("rk") &&
            col("llo") <= col("rhi") && col("rlo") <= col("lhi"))
        .groupBy(col("lk")).agg(count(lit(1)).as("n"))
    }
    run("interval-native-hotkey") {
      graft.plans.NativeIntervalJoin
        .overlap(hot("l"), hot("r"), "lk", "llo", "lhi", "rk", "rlo", "rhi")
        .groupBy(col("lk")).agg(count(lit(1)).as("n"))
    }

    // r13: eviction-CHURN shape — every left row expires intervals, so
    // every left row pays the in-place compaction scan (the in-memory
    // regime's per-row O(depth) eviction cost). 200 keys × 2000
    // intervals, right intervals live 400 time units (steady ~40
    // concurrent), lefts advance 10 units per row; output ~16M pairs.
    // The composed form's per-key group nested loop does 2000² predicate
    // evals per key. History: an intermediate r13 draft stored the
    // active set in a ping-pong ExternalAppendOnlyUnsafeRowArray whose
    // eviction COPIED every survivor per left row — this leg measured
    // that draft at 0.913 s vs the shipped in-place compaction's
    // 0.798 s (and the EAUA draft was then discarded outright for the
    // spill-reader leak, see plans/IntervalJoin.scala). The leg now pins
    // the unified store's eviction-churn cost round-over-round.
    def churn(prefix: String, live: Long) = spark.range(400000)
      .select((col("id") % 200).as(s"${prefix}k"),
        (col("id") / 200 * 10).as(s"${prefix}lo"))
      .withColumn(s"${prefix}hi", col(s"${prefix}lo") + live)
    run("interval-composed-churn") {
      churn("l", 5).join(churn("r", 400),
          col("lk") === col("rk") &&
            col("llo") <= col("rhi") && col("rlo") <= col("lhi"))
        .groupBy(col("lk")).agg(count(lit(1)).as("n"))
    }
    run("interval-native-churn") {
      graft.plans.NativeIntervalJoin
        .overlap(churn("l", 5), churn("r", 400), "lk", "llo", "lhi", "rk", "rlo", "rhi")
        .groupBy(col("lk")).agg(count(lit(1)).as("n"))
    }

    // r11-4a: KMV sketch distinct vs exact COUNT(DISTINCT) on a synthetic
    // 20M-row / 5M-distinct-values / 8-group table — the shape where exact
    // distinct must EXPAND-SHUFFLE every distinct (group, value) pair while
    // the KMV partial aggregation ships ≤ k longs per (group, partition).
    // The catalog query (q_agg_kmv_set_ops, 10k rows) is scan-floored by
    // construction; THIS is the operator number.
    def big = spark.range(20000000L)
      .select((col("id") % 8).as("g"), (col("id") * 2654435761L % 5000000L).as("v"))
    run("distinct-exact-20M") {
      big.groupBy(col("g")).agg(countDistinct(col("v")).as("n"))
    }
    run("distinct-kmv-20M") {
      val kmv = udaf(new graft.operators.KmvAggregator(256))
      big.select(col("g"), xxhash64(col("v")).as("h"))
        .groupBy(col("g")).agg(kmv(col("h")).as("sk"))
        .select(col("g"), size(col("sk")).as("n"))
    }

    // r11-4b: the NFC kernel's ASCII bypass. Same 2M × ~80-char strings;
    // "ascii" rows take the byte-scan bypass, "nonascii" rows (one
    // combining mark appended) pay the full decode + Normalizer walk;
    // "floor" is the same consume without nfc at all.
    def strs = spark.range(2000000L)
      .select(col("id"), concat(lit("the quick brown fox jumps over the lazy dog "),
        col("id").cast("string"), lit(" and runs away fast")).as("s"))
    def consumeLen(df: org.apache.spark.sql.DataFrame,
        c: org.apache.spark.sql.Column) =
      df.select(length(c).as("l")).agg(sum(col("l")).as("t"))
    run("nfc-floor-no-normalize") {
      consumeLen(strs, col("s"))
    }
    run("nfc-ascii-bypass") {
      consumeLen(strs, graft.functions.NfcNormalizeExpression.column(col("s")))
    }
    run("nfc-normalize-path") {
      consumeLen(strs.select(col("id"), concat(col("s"), lit("é")).as("s")),
        graft.functions.NfcNormalizeExpression.column(col("s")))
    }
    // r11-4c: the composed alternative the kernel replaces — a Scala UDF
    // around java.text.Normalizer (String-boxed both ways, breaks
    // whole-stage codegen, and cannot see the ASCII bypass because the
    // boxing already decoded the bytes).
    run("nfc-udf-ascii") {
      val nfcUdf = udf((s: String) =>
        if (s == null) null
        else java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
      consumeLen(strs, nfcUdf(col("s")))
    }

    // r11-5: the two top-k-per-group forms the engine fences — the window
    // rank filter (plans as partial+final WindowGroupLimitExec: per-
    // partition sort capped at k, exchange carries k·groups·partitions
    // rows) vs the typed heap Aggregator (map-side k-element buffers, no
    // sort at all, but typed-row serialization at the aggregate boundary).
    // 20M rows / 8 groups / k=3 — huge groups, tiny k, the shape where the
    // forms differ most.
    def scored = spark.range(20000000L)
      .select((col("id") % 8).as("g"),
        (xxhash64(col("id")).cast("double") / 1e18).as("score"), col("id").as("tag"))
    run("topk-window-20M") {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("g")).orderBy(col("score").desc, col("tag"))
      scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
    }
    run("topk-udaf-20M") {
      val topk = udaf(new graft.operators.TopKAggregator(3),
        org.apache.spark.sql.Encoders.product[graft.operators.ScoredTag])
      scored
        .groupBy(col("g")).agg(topk(col("score"), col("tag")).as("top"))
        .select(col("g"), explode(col("top")).as("e"))
    }

    // r14: the watermark-buffered exact CEP (StatefulOps.
    // patternMatchCountsExact) vs the O(1)-state DFA fold — the opt-in
    // exactness price in wall-clock, end-to-end through a real streaming
    // query on RocksDB state. 600k events / 20k users / 30 events per
    // user, delivered in 4 event-time-ordered triggers (+2 flushes for
    // the buffered form's settle); ~7.5s event-time band per trigger
    // against a 10s watermark delay, so buffered events wait ~1.5
    // triggers before folding — the realistic regime. The buffered form
    // pays an O(new events) ListState append per touched key per trigger
    // plus one buffer read and the (ts,eventId) sort when the min-ts
    // timer fires (here: every trigger, since events settle every
    // trigger); the default pays 3 longs per key and folds inline.
    // Streaming wall-clock is noisier
    // than the noop path: median of 3 full query lifecycles, warm run
    // discarded.
    // one home for the provider-swap both streaming harnesses need
    def withRocksDB[T](body: => T): T = {
      val key = "spark.sql.streaming.stateStore.providerClass"
      val prev = spark.conf.getOption(key)
      spark.conf.set(key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      try body
      finally prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
    }

    // r16 (r15 verdict task 6): deterministic state-op counters BESIDE the
    // noisy wall-clock. Streaming lifecycle wall is the noisiest number
    // this harness produces (the r15 session-price claim needed two
    // windows and still scattered 1.07-1.23×); state store row updates,
    // removals, fired timers, and RocksDB get/put counts are functions of
    // the batch split, not the host, so they agree rep-to-rep and future
    // exactness-price claims can lead with them. Each leg returns its
    // query's progress events; values identical across the 3 reps print
    // bare, jittery ones print as min..max (commitMs is a latency — it is
    // EXPECTED to jitter and is reported for the changelog A/B below).
    def stateCounters(progs: Seq[org.apache.spark.sql.streaming.StreamingQueryProgress])
        : Map[String, Long] = {
      def cm(p: org.apache.spark.sql.streaming.StateOperatorProgress, k: String): Long =
        Option(p.customMetrics.get(k)).map(_.longValue).getOrElse(0L)
      val ops = progs.flatMap(_.stateOperators.toSeq)
      scala.collection.immutable.ListMap(
        "updated" -> ops.map(_.numRowsUpdated).sum,
        "removed" -> ops.map(_.numRowsRemoved).sum,
        "timersFired" -> ops.map(cm(_, "numExpiredTimers")).sum,
        "gets" -> ops.map(cm(_, "rocksdbGetCount")).sum,
        "puts" -> ops.map(cm(_, "rocksdbPutCount")).sum,
        "commitMs" -> ops.map(_.commitTimeMs).sum)
    }
    def printCounters(name: String, reps: Seq[Map[String, Long]]): Unit = {
      val line = reps.head.keys.map { k =>
        val vs = reps.map(_(k))
        if (vs.distinct.size == 1) s"$k=${vs.head}" else s"$k=${vs.min}..${vs.max}"
      }.mkString(" ")
      println(f"[ab-state] $name%-26s $line")
    }

    def abStream(name: String)(
        mk: Int => Seq[org.apache.spark.sql.streaming.StreamingQueryProgress]): Unit = {
      if (only.nonEmpty && !only.exists(name.contains)) return
      withRocksDB {
        var rep = 0
        val counters = Seq.newBuilder[Map[String, Long]]
        def once(warm: Boolean): Double = {
          rep += 1
          val t0 = System.nanoTime()
          val progs = mk(rep)
          val dt = (System.nanoTime() - t0) / 1e9
          if (!warm) counters += stateCounters(progs)
          dt
        }
        once(warm = true) // warm: codegen + provider + checkpoint dirs
        val times = Seq.fill(3)(once(warm = false)).sorted
        println(f"[ab] $name%-28s ${times(1)}%.3f s (median of 3: ${times.map(x => f"$x%.3f").mkString(", ")})")
        printCounters(name, counters.result())
      }
    }
    val nUsers = 20000
    val nEvents = 600000
    val streamTypes = Array("view", "click", "purchase", "signup")
    // event g: user g%nUsers, per-user ts advancing 1s per event, types
    // cycling with a stride coprime to the user count so every user sees
    // purchases; batches are consecutive event-time bands
    def evtAt(g: Long) = (g % nUsers, 1000000L + (g / nUsers) * 1000L, g,
      streamTypes(((g * 13) % 4).toInt))
    def streamBatches: Seq[Seq[Long]] =
      (0 until 4).map(b => (0 until nEvents / 4).map(i => b.toLong * (nEvents / 4) + i))
    abStream("cep-unbuffered-600k") { rep =>
      import spark.implicits._
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      val in = MemoryStream[graft.streaming.StreamOps.UserEvent](spark)
      val q = graft.streaming.StatefulOps.patternMatchCounts(in.toDS())
        .writeStream.outputMode("update").format("memory")
        .queryName(s"ab_cep_plain_$rep").start()
      streamBatches.foreach { b =>
        in.addData(b.map { g =>
          val (u, ts, id, ty) = evtAt(g)
          graft.streaming.StreamOps.UserEvent(u, ts * 1000L, id, ty, 0L)
        })
        q.processAllAvailable()
      }
      val progs = q.recentProgress.toSeq
      q.stop()
      progs
    }
    // shared wiring for the buffered-exact legs: n event-time-ordered
    // batches through patternMatchCountsExact, then two flush batches
    // (two watermark advances so the armed timers fire and settle
    // everything). The legs vary only the batch count, the per-event
    // generator, and the watermark delay — keep them parameter-only so
    // the A/B comparison never diverges on wiring.
    def bufferedCepLeg(name: String, nBatches: Int, watermark: String)(
        gen: Long => (Long, Long, Long, String)): Unit =
      abStream(name) { rep =>
        import spark.implicits._
        import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
        val in = MemoryStream[graft.streaming.StatefulOps.TimedUserEvent](spark)
        val q = graft.streaming.StatefulOps
          .patternMatchCountsExact(in.toDS(), watermark)
          .writeStream.outputMode("update").format("memory")
          .queryName(s"${name.replace('-', '_')}_$rep").start()
        (0 until nBatches).foreach { b =>
          in.addData((0 until nEvents / nBatches).map { i =>
            val (u, ts, id, ty) = gen(b.toLong * (nEvents / nBatches) + i)
            graft.streaming.StatefulOps.TimedUserEvent(
              new java.sql.Timestamp(ts), u, id, ty, 0L)
          })
          q.processAllAvailable()
        }
        Seq(200000000L, 300000000L).zipWithIndex.foreach { case (off, k) =>
          in.addData(Seq(graft.streaming.StatefulOps.TimedUserEvent(
            new java.sql.Timestamp(1000000L + off), 999999L, -1L - k, "s", 0L)))
          q.processAllAvailable()
        }
        val progs = q.recentProgress.toSeq
        q.stop()
        progs
      }
    bufferedCepLeg("cep-buffered-exact-600k", 4, "10 seconds")(evtAt)
    // r14 continuation: the LONG-horizon regime for the buffered-exact
    // buffer — 8 triggers, 2k users (300 events per user), watermark
    // delay wider than the whole event-time span, so nothing settles
    // until the two final flushes and the per-key buffer grows for the
    // entire session. This is the regime that exposed the wm+1 timer:
    // a timer re-armed at watermark+1 fires on EVERY advance and its
    // callback read and (for the live remainder) rewrote the whole
    // backlog per key per trigger even though nothing was due —
    // switching the buffer ValueState[Seq]→ListState alone moved
    // nothing here (16.92 s vs 16.69 s, medians of 3 on one window)
    // because the timer's full-buffer pass dominated both layouts.
    // Arming at the MIN buffered ts instead (fires only when something
    // settles) plus the ListState append is the O(new events)/trigger
    // ingest: this leg 16.69 → 14.87 s with the tightest spread of the
    // session (14.57/14.87/15.24), the short-horizon leg above 11.68 →
    // 10.94 s, and per-trigger cost now matches the O(1)-state
    // unbuffered form (1.49 vs 1.41 s/trigger at 10 vs 4 triggers) —
    // the residual exactness price is the flush triggers themselves.
    val lhUsers = 2000
    def evtLH(g: Long) = (g % lhUsers, 1000000L + (g / lhUsers) * 1000L, g,
      streamTypes(((g * 13) % 4).toInt))
    bufferedCepLeg("cep-buffered-longhorizon-600k", 8, "400 seconds")(evtLH)

    // r15 (r14 verdict task 3): settle-fold memory AND latency with ONE
    // key driven to the depth cap (spark.graft.bufferedExact.maxEvents,
    // default 1M) under RocksDB — the measure-and-decide for the fold's
    // materialize+sort of the whole backlog (StatefulOps' settle pass).
    // The leg ingests n events for a single user inside the watermark
    // horizon (10 × n/10 triggers, each an O(new events) ListState merge),
    // GCs to a clean baseline, then times the ONE trigger whose timer
    // fires the full-backlog fold while a sampler thread records peak
    // used heap. Reported: settle trigger wall, peak-heap delta over the
    // pre-settle baseline. A 250k point rides along for the slope.
    // Single-shot by design (a peak is not an average; medians would
    // need 3 full 1M ingests for no extra information).
    // r15 RESULT (3 runs, host load 5-19 — co-tenant-contended windows,
    // stated): 1M settle 1.991 / 1.910 / 2.037 s, peakHeapDelta 242 /
    // 303 / 300 MB — STABLE at the number that matters; the 250k point
    // read 3.0-6.6 s / 151-271 MB, noisier than the 1M leg because the
    // settle trigger is its first execution of the fold path and fixed
    // per-batch overhead + JIT warm-up dominate a 4×-smaller backlog.
    // Decision recorded on MaxBufferedEventsKey: ~0.3 KB/event and ~2 s
    // at the 1M default cap needs no chunked fold.
    def capFoldLeg(name: String, nEvents: Int): Unit = {
      if (only.nonEmpty && !only.exists(name.contains)) return
      withRocksDB {
        import spark.implicits._
        import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
        val in = MemoryStream[graft.streaming.StatefulOps.TimedUserEvent](spark)
        // delay wider than the event-time span: NOTHING settles during
        // ingest, the backlog reaches exactly n before the flush
        val q = graft.streaming.StatefulOps
          .patternMatchCountsExact(in.toDS(), watermark = "2000 seconds")
          .writeStream.outputMode("update").format("memory")
          .queryName(name.replace('-', '_')).start()
        val base = 1000000L
        val chunk = nEvents / 10
        (0 until 10).foreach { b =>
          in.addData((0 until chunk).map { i =>
            val g = b.toLong * chunk + i
            graft.streaming.StatefulOps.TimedUserEvent(
              new java.sql.Timestamp(base + g), 1L, g, streamTypes(((g * 13) % 4).toInt), 0L)
          })
          q.processAllAvailable()
        }
        // first flush moves the watermark past every event (committed at
        // batch end); the SECOND trigger runs the timer's settle fold
        in.addData(Seq(graft.streaming.StatefulOps.TimedUserEvent(
          new java.sql.Timestamp(base + nEvents + 2000000L + 600000L), 999L, -1L, "s", 0L)))
        q.processAllAvailable()
        val rt = Runtime.getRuntime
        System.gc(); Thread.sleep(200); System.gc()
        val baseline = rt.totalMemory() - rt.freeMemory()
        @volatile var peak = baseline
        val sampling = new java.util.concurrent.atomic.AtomicBoolean(true)
        val sampler = new Thread(() => {
          while (sampling.get()) {
            val u = rt.totalMemory() - rt.freeMemory()
            if (u > peak) peak = u
            Thread.sleep(10)
          }
        }, s"$name-heap-sampler")
        sampler.setDaemon(true)
        sampler.start()
        in.addData(Seq(graft.streaming.StatefulOps.TimedUserEvent(
          new java.sql.Timestamp(base + nEvents + 2000000L + 1200000L), 999L, -2L, "s", 0L)))
        val t0 = System.nanoTime()
        q.processAllAvailable()
        val settle = (System.nanoTime() - t0) / 1e9
        sampling.set(false)
        sampler.join()
        q.stop()
        val mb = 1024 * 1024
        println(f"[ab] $name%-28s settle=$settle%.3f s  peakHeapDelta=${(peak - baseline) / mb}%d MB  (baseline=${baseline / mb}%d MB, n=$nEvents%d, one shot)")
      }
    }
    capFoldLeg("buffered-capfold-250k", 250000)
    capFoldLeg("buffered-capfold-1M", 1000000)

    // r15: the sessionization exactness price (PARITY row 22 vs row 11)
    // — the same 600k-event / 20k-user / 4-trigger regime as the CEP
    // pair above, gap 5s against per-user events 1s apart (one live
    // session per user, folding progressively as the watermark advances,
    // closing at the flush). The bounded form pays an O(K) fragment
    // merge per event inline; the exact form pays the ListState append
    // per trigger plus the settle-fold sort when its min-ts timer fires.
    // r15 RESULT, two windows (streaming lifecycle wall-clock is the
    // noisiest thing this harness measures — full query start/stop per
    // rep): window A medians 12.250 (bounded) vs 13.093 (exact); window
    // B 14.192 vs 17.407 with one 28.7 s GC/co-tenant outlier in the
    // exact leg. Honest statement: min-vs-min across all reps 10.887 vs
    // 12.729 = **1.17×**, medians scatter 1.07-1.23× — the sessionization
    // exactness price sits around ~1.2×, well below the CEP trio's
    // 1.8-1.9×, because the bounded sibling already pays a per-event
    // sorted merge inline while the exact form's extra work is only the
    // buffer append + one settle sort per fold cohort.
    def sessionLeg(name: String)(
        wire: org.apache.spark.sql.Dataset[graft.streaming.StatefulOps.TimedEvent] =>
          org.apache.spark.sql.Dataset[graft.streaming.StatefulOps.SessionSummary]): Unit =
      abStream(name) { rep =>
        import spark.implicits._
        import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
        val in = MemoryStream[graft.streaming.StatefulOps.TimedEvent](spark)
        val q = wire(in.toDS())
          .writeStream.outputMode("append").format("memory")
          .queryName(s"${name.replace('-', '_')}_$rep").start()
        (0 until 4).foreach { b =>
          in.addData((0 until nEvents / 4).map { i =>
            val g = b.toLong * (nEvents / 4) + i
            graft.streaming.StatefulOps.TimedEvent(
              new java.sql.Timestamp(1000000L + (g / nUsers) * 1000L), g % nUsers, g, 1L)
          })
          q.processAllAvailable()
        }
        Seq(200000000L, 300000000L).zipWithIndex.foreach { case (off, k) =>
          in.addData(Seq(graft.streaming.StatefulOps.TimedEvent(
            new java.sql.Timestamp(1000000L + off), 999999L, -1L - k, 0L)))
          q.processAllAvailable()
        }
        val progs = q.recentProgress.toSeq
        q.stop()
        progs
      }
    sessionLeg("sessions-bounded-600k")(
      graft.streaming.StatefulOps.timedSessions(_, gapMs = 5000L, watermark = "10 seconds"))
    sessionLeg("sessions-exact-600k")(
      graft.streaming.StatefulOps.timedSessionsExact(_, gapMs = 5000L, watermark = "10 seconds"))

    // r15 (review finding): the session settle fold's TAIL fast path —
    // ONE heartbeat key emitting events spaced just past the gap (6 s vs
    // gap 5 s) under a delay wider than the whole span, so a single
    // settle trigger folds n events into n distinct fragments. The
    // general merge-insert re-scans the fragment vector per event: n²/2
    // span steps (2·10¹⁰ at 200k — minutes-to-hours inside one task);
    // the fast path (every due event lands at/after the tail fragment,
    // guaranteed by the fold invariant) makes it O(n).
    // r15 RESULT: settle=2.321 s at 200k fragments — linear, proven.
    def sessionHeartbeatLeg(name: String, n: Int): Unit = {
      if (only.nonEmpty && !only.exists(name.contains)) return
      withRocksDB {
        import spark.implicits._
        import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
        val in = MemoryStream[graft.streaming.StatefulOps.TimedEvent](spark)
        val q = graft.streaming.StatefulOps
          .timedSessionsExact(in.toDS(), gapMs = 5000L, watermark = "4000000 seconds")
          .writeStream.outputMode("append").format("memory")
          .queryName(name.replace('-', '_')).start()
        val base = 1000000L
        (0 until 10).foreach { b =>
          in.addData((0 until n / 10).map { i =>
            val g = b.toLong * (n / 10) + i
            graft.streaming.StatefulOps.TimedEvent(
              new java.sql.Timestamp(base + g * 6000L), 1L, g, 1L)
          })
          q.processAllAvailable()
        }
        in.addData(Seq(graft.streaming.StatefulOps.TimedEvent(
          new java.sql.Timestamp(base + n * 6000L + 4000000000L + 600000L), 999L, -1L, 0L)))
        q.processAllAvailable()
        in.addData(Seq(graft.streaming.StatefulOps.TimedEvent(
          new java.sql.Timestamp(base + n * 6000L + 4000000000L + 1200000L), 999L, -2L, 0L)))
        val t0 = System.nanoTime()
        q.processAllAvailable()
        val settle = (System.nanoTime() - t0) / 1e9
        q.stop()
        println(f"[ab] $name%-28s settle=$settle%.3f s ($n%d gap-separated fragments in one fold cohort, one shot)")
      }
    }
    sessionHeartbeatLeg("sessions-heartbeat-capfold-200k", 200000)

    // r16 (r15 verdict task 5): RocksDB CHANGELOG checkpointing for the
    // buffered-exact operators — measure-and-decide. Default RocksDB
    // commits upload a FULL snapshot (zip of the live sst files) per
    // trigger; with
    // `spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled`
    // the commit uploads only that trigger's changelog and snapshots move
    // to background maintenance — at 100 TB-class state the per-trigger
    // upload goes from O(state size) to O(trigger delta), which is the
    // whole checkpoint cost model. Locality caveat, stated: here the
    // "upload" is a local-fs copy, so the BYTES written under the
    // checkpoint's state/ dir are measured exactly while commit latency
    // (the counters' commitMs) is directional only. Same 600k/20k-user
    // regime as the exactness-price legs; trio + row 22, each off/on.
    def stateDirBytes(ckpt: String): Long = {
      val root = java.nio.file.Paths.get(ckpt, "state")
      if (!java.nio.file.Files.exists(root)) 0L
      else {
        import scala.jdk.CollectionConverters._
        val s = java.nio.file.Files.walk(root)
        try s.iterator().asScala
          .filter(java.nio.file.Files.isRegularFile(_))
          .map(java.nio.file.Files.size(_)).sum
        finally s.close()
      }
    }
    def changelogLeg(op: String, changelog: Boolean): Unit = {
      val name = s"$op-cl-${if (changelog) "on" else "off"}"
      if (only.nonEmpty && !only.exists(name.contains)) return
      val clKey = "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
      val prevCl = spark.conf.getOption(clKey)
      spark.conf.set(clKey, changelog.toString)
      try withRocksDB {
        import spark.implicits._
        import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
        import graft.streaming.StatefulOps
        var rep = 0
        val counters = Seq.newBuilder[Map[String, Long]]
        // plain mutable buffers, snapshotted only after all reps (r16
        // ADVICE: calling a Builder's result() mid-build and appending
        // after it is undefined by the generic Builder contract)
        var warmBytes = 0L
        val repBytes = scala.collection.mutable.ListBuffer.empty[Long]
        def runOnce(): (Seq[org.apache.spark.sql.streaming.StreamingQueryProgress], Long) = {
          rep += 1
          val ckpt = java.nio.file.Files.createTempDirectory("graft-ab-cl").toString
          val qn = s"${name.replace('-', '_')}_$rep"
          val progs = op match {
            case "sessions" =>
              val in = MemoryStream[StatefulOps.TimedEvent](spark)
              val q = StatefulOps
                .timedSessionsExact(in.toDS(), gapMs = 5000L, watermark = "10 seconds")
                .writeStream.outputMode("append").format("memory").queryName(qn)
                .option("checkpointLocation", ckpt).start()
              (0 until 4).foreach { b =>
                in.addData((0 until nEvents / 4).map { i =>
                  val g = b.toLong * (nEvents / 4) + i
                  StatefulOps.TimedEvent(
                    new java.sql.Timestamp(1000000L + (g / nUsers) * 1000L), g % nUsers, g, 1L)
                })
                q.processAllAvailable()
              }
              Seq(200000000L, 300000000L).zipWithIndex.foreach { case (off, k) =>
                in.addData(Seq(StatefulOps.TimedEvent(
                  new java.sql.Timestamp(1000000L + off), 999999L, -1L - k, 0L)))
                q.processAllAvailable()
              }
              val p = q.recentProgress.toSeq; q.stop(); p
            case trio =>
              val in = MemoryStream[StatefulOps.TimedUserEvent](spark)
              val ds = in.toDS()
              def started[T](w: org.apache.spark.sql.streaming.DataStreamWriter[T],
                  mode: String) = w.outputMode(mode).format("memory").queryName(qn)
                .option("checkpointLocation", ckpt).start()
              val q = trio match {
                case "cep" =>
                  started(StatefulOps.patternMatchCountsExact(ds, "10 seconds").writeStream, "update")
                case "cusum" =>
                  started(StatefulOps.cusumMonitorExact(ds, 20L, 100L, "10 seconds").writeStream, "update")
                case "attribution" =>
                  started(StatefulOps.lastTouchAttributionExact(ds, "10 seconds").writeStream, "append")
              }
              (0 until 4).foreach { b =>
                in.addData((0 until nEvents / 4).map { i =>
                  val g = b.toLong * (nEvents / 4) + i
                  val (u, ts, id, ty) = evtAt(g)
                  StatefulOps.TimedUserEvent(new java.sql.Timestamp(ts), u, id, ty, g % 41)
                })
                q.processAllAvailable()
              }
              Seq(200000000L, 300000000L).zipWithIndex.foreach { case (off, k) =>
                in.addData(Seq(StatefulOps.TimedUserEvent(
                  new java.sql.Timestamp(1000000L + off), 999999L, -1L - k, "s", 0L)))
                q.processAllAvailable()
              }
              val p = q.recentProgress.toSeq; q.stop(); p
          }
          val b = stateDirBytes(ckpt)
          (progs, b)
        }
        def once(warm: Boolean): Double = {
          val t0 = System.nanoTime()
          val (progs, b) = runOnce()
          val dt = (System.nanoTime() - t0) / 1e9
          if (warm) warmBytes = b
          else { counters += stateCounters(progs); repBytes += b }
          dt
        }
        once(warm = true)
        // both per-rep lists print in RUN ORDER so a byte value pairs with
        // its rep's time (r16 ADVICE); the headline stays the median
        val runs = Seq.fill(3)(once(warm = false))
        val median = runs.sorted.apply(1)
        val bs = repBytes.toSeq
        println(f"[ab] $name%-28s $median%.3f s (runs, run-order: ${runs.map(x => f"$x%.3f").mkString(", ")})  stateDirMB(run-order)=${bs.map(_ / 1048576.0).map(b => f"$b%.1f").mkString(",")} (warm ${warmBytes / 1048576.0}%.1f)")
        printCounters(name, counters.result())
      } finally prevCl.fold(spark.conf.unset(clKey))(spark.conf.set(clKey, _))
    }
    Seq("cep", "cusum", "attribution", "sessions").foreach { op =>
      changelogLeg(op, changelog = false)
      changelogLeg(op, changelog = true)
    }

    // r17 (r16 verdict task 5): changelog-mode LONG-HORIZON soak. The
    // default flipped on after 4-trigger A/B windows; the 100 TB question
    // for the new default is whether changelog files accumulate
    // unboundedly across a long run, or plateau once background
    // maintenance uploads snapshots and deletes expired versions. 50
    // triggers of steady sessionization churn (every trigger closes the
    // previous burst's sessions, so state itself stays bounded) under a
    // maintenance regime the horizon actually reaches (interval 500 ms,
    // minBatchesToRetain 5 — the 60 s default would never fire inside a
    // ~30 s run); after each trigger, the state dir's file count and
    // bytes. Expected shape: growth over the first ~minBatchesToRetain
    // triggers, then a file-count/byte plateau (cleanup keeps pace with
    // the per-trigger changelog append) — printed as a trajectory so the
    // GATE can quote plateau vs max.
    def changelogSoakLeg(name: String, triggers: Int): Unit = {
      if (only.nonEmpty && !only.exists(name.contains)) return
      val confs = Map(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" -> "true",
        "spark.sql.streaming.stateStore.maintenanceInterval" -> "500ms",
        "spark.sql.streaming.minBatchesToRetain" -> "5")
      val prev = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      try withRocksDB {
        import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
        import graft.streaming.StatefulOps
        import spark.implicits._
        val ckpt = java.nio.file.Files.createTempDirectory("graft-ab-clsoak").toString
        // the walk races the very maintenance under test (files vanish
        // between listing and stat, even briefly past q.stop() until the
        // provider unloads) — tolerate per-file disappearance and retry a
        // walk the race breaks mid-iteration
        def listStateFiles(): Seq[java.nio.file.Path] = {
          val root = java.nio.file.Paths.get(ckpt, "state")
          def attempt(): Seq[java.nio.file.Path] = {
            import scala.jdk.CollectionConverters._
            val s = java.nio.file.Files.walk(root)
            try s.iterator().asScala
              .filter(java.nio.file.Files.isRegularFile(_)).toVector
            finally s.close()
          }
          if (!java.nio.file.Files.exists(root)) Vector.empty
          else (1 to 3).view.map { i =>
            try Some(attempt())
            catch {
              case _: java.io.IOException | _: java.io.UncheckedIOException
                  if i < 3 => None
            }
          }.collectFirst { case Some(v) => v }.get
        }
        def stats(): (Long, Long) = {
          val fs = listStateFiles()
          (fs.size.toLong, fs.map { f =>
            try java.nio.file.Files.size(f)
            catch { case _: java.io.IOException => 0L }
          }.sum)
        }
        val in = MemoryStream[StatefulOps.TimedEvent](spark)
        val q = StatefulOps
          .timedSessionsExact(in.toDS(), gapMs = 5000L, watermark = "10 seconds")
          .writeStream.outputMode("append").format("memory")
          .queryName(s"${name.replace('-', '_')}")
          .option("checkpointLocation", ckpt).start()
        val users = 200
        val traj = (1 to triggers).map { tr =>
          // one 4-event burst per user per trigger, bursts 30 s apart:
          // the watermark passes burst N's close before burst N+1 lands,
          // so sessions emit (and state drains) every trigger
          in.addData((0 until users).flatMap(u => (0 until 4).map(k =>
            StatefulOps.TimedEvent(
              new java.sql.Timestamp(1000000L + tr * 30000L + k * 1000L),
              u.toLong, tr * 10L + k, 1L))))
          q.processAllAvailable()
          // async maintenance does the snapshotting/deleting under test —
          // sleep a full maintenanceInterval (500 ms, set above) so every
          // per-trigger sample sits AFTER at least one maintenance pass;
          // anything shorter lets samples land before the pass and noises
          // the trajectory (r17 ADVICE)
          Thread.sleep(550)
          stats()
        }
        q.stop()
        // end-of-horizon breakdown by file kind: the retention claim is
        // specifically about the per-trigger CHANGELOG files and the
        // maintenance-uploaded snapshot zips; RocksDB working files are
        // bounded by live state, not the horizon
        val byKind = listStateFiles().groupBy { f =>
          val n = f.getFileName.toString
          if (n.endsWith(".changelog")) "changelog"
          else if (n.endsWith(".zip")) "snapshot-zip"
          else if (n.endsWith(".sst")) "sst"
          else if (n.startsWith(".") && n.endsWith(".crc")) "crc"
          else "other"
        }.view.mapValues(_.size).toMap
        val marks = Seq(1, 5, 10, 20, 30, 40, triggers).distinct.filter(_ <= triggers)
        val files = marks.map(m => s"t$m=${traj(m - 1)._1}").mkString(" ")
        val mbs = marks.map(m => f"t$m=${traj(m - 1)._2 / 1048576.0}%.1f").mkString(" ")
        val maxFiles = traj.map(_._1).max
        val maxMb = traj.map(_._2).max / 1048576.0
        println(f"[ab] $name%-28s files: $files  (max $maxFiles)")
        println(f"[ab] $name%-28s MB:    $mbs  (max $maxMb%.1f)")
        println(f"[ab] $name%-28s t$triggers%d by kind: " +
          byKind.toSeq.sortBy(_._1).map { case (k, n) => s"$k=$n" }.mkString(" "))
      } finally prev.foreach { case (k, v) =>
        v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
    }
    changelogSoakLeg("sessions-cl-soak-50t", 50)

    // r18 (r17 verdict task 4): the *ExactDeduped compositions' measured
    // price. PARITY's cost sentence ("the dedup operator roughly doubles
    // the state class, same horizon") gets the same measured-trajectory
    // treatment the row 19-22 plateaus got: plain vs deduped CEP at the
    // base and far corners of a (10× keys, 10× redelivery rate) grid —
    // 600k unique events in 4 event-time-band triggers either way; every
    // dupEvery-th event is delivered TWICE inside its batch (the
    // intra-batch redelivery shape the dedup absorbs; 1% vs 10%).
    // Reported beside the wall + shared state counters: each operator's
    // PEAK per-trigger state rows and bytes, split dedup vs buffered, so
    // the "roughly doubles" claim is checked against the actual ratio
    // (the dedup table holds one row per event id in the horizon — the
    // same class the buffer pays — and both drain with the watermark).
    def dedupPriceLeg(name: String, users: Int, dupEvery: Int,
        dedup: Boolean): Unit = {
      if (only.nonEmpty && !only.exists(name.contains)) return
      withRocksDB {
        import spark.implicits._
        import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
        import graft.streaming.StatefulOps
        var rep = 0
        val counters = Seq.newBuilder[Map[String, Long]]
        val peaks = Seq.newBuilder[Map[String, Long]]
        def once(warm: Boolean): Double = {
          rep += 1
          val t0 = System.nanoTime()
          val in = MemoryStream[StatefulOps.TimedUserEvent](spark)
          val wired =
            if (dedup) StatefulOps.patternMatchCountsExactDeduped(in.toDS(), "10 seconds")
            else StatefulOps.patternMatchCountsExact(in.toDS(), "10 seconds")
          val q = wired.writeStream.outputMode("update").format("memory")
            .queryName(s"${name.replace('-', '_')}_$rep").start()
          (0 until 4).foreach { b =>
            in.addData((0 until nEvents / 4).flatMap { i =>
              val g = b.toLong * (nEvents / 4) + i
              val e = StatefulOps.TimedUserEvent(
                new java.sql.Timestamp(1000000L + (g / users) * 1000L),
                g % users, g, streamTypes(((g * 13) % 4).toInt), 0L)
              if (i % dupEvery == 0) Seq(e, e) else Seq(e)
            })
            q.processAllAvailable()
          }
          Seq(200000000L, 300000000L).zipWithIndex.foreach { case (off, k) =>
            in.addData(Seq(StatefulOps.TimedUserEvent(
              new java.sql.Timestamp(1000000L + off), 999999L, -1L - k, "s", 0L)))
            q.processAllAvailable()
          }
          val progs = q.recentProgress.toSeq
          q.stop()
          val dt = (System.nanoTime() - t0) / 1e9
          if (!warm) {
            counters += stateCounters(progs)
            def peak(dedupOp: Boolean, f: org.apache.spark.sql.streaming.StateOperatorProgress => Long): Long =
              progs.map(_.stateOperators.toSeq
                .filter(_.operatorName.toLowerCase.contains("dedup") == dedupOp)
                .map(f).sum).maxOption.getOrElse(0L)
            peaks += scala.collection.immutable.ListMap(
              "dedupRowsPeak" -> peak(dedupOp = true, _.numRowsTotal),
              "dedupMBPeak" -> peak(dedupOp = true, _.memoryUsedBytes) / 1048576L,
              "bufRowsPeak" -> peak(dedupOp = false, _.numRowsTotal),
              "bufMBPeak" -> peak(dedupOp = false, _.memoryUsedBytes) / 1048576L)
          }
          dt
        }
        once(warm = true)
        val times = Seq.fill(3)(once(warm = false)).sorted
        println(f"[ab] $name%-28s ${times(1)}%.3f s (median of 3: ${times.map(x => f"$x%.3f").mkString(", ")})")
        printCounters(name, counters.result())
        printCounters(name, peaks.result())
      }
    }
    dedupPriceLeg("cep-dedup-price-plain-2k-1pct", 2000, 100, dedup = false)
    dedupPriceLeg("cep-dedup-price-dd-2k-1pct", 2000, 100, dedup = true)
    dedupPriceLeg("cep-dedup-price-plain-20k-10pct", 20000, 10, dedup = false)
    dedupPriceLeg("cep-dedup-price-dd-20k-10pct", 20000, 10, dedup = true)

    // r19 (verdict task 8): the STORAGE-BACKED LSH signature table — the
    // documented 100 TB shape for the dedup family (Dedup scaladoc: "At
    // corpus scale, write the signature table to storage") — measured
    // instead of asserted. Three legs, same corpus, same band join:
    //   lsh-ckpt       the shipped query-path form (signatures eagerly
    //                  localCheckpoint'ed, pairs in the same job);
    //   lsh-store-cold signature computation + parquet WRITE + read-back
    //                  pairs — the full first-pass cost a storage-backed
    //                  pipeline pays once per corpus;
    //   lsh-store-warm pairs over an ALREADY-WRITTEN signature table —
    //                  the steady-state cost every downstream pass
    //                  (pairing, clustering, re-threshold sweeps) pays,
    //                  with the shingle/minhash kernels amortized away.
    // The cost model the restructure rides on: checkpoint ≈ store-cold
    // (same kernel work, parquet write vs block-manager write), while
    // store-warm drops the kernel entirely — if store-warm is NOT
    // materially cheaper than ckpt, writing the table buys nothing.
    val sigDir = s"${System.getProperty("java.io.tmpdir")}/graft-ab-sig.parquet"
    def sigTable = graft.operators.Partitioning.fanOutNarrowScan(
        t.documents.select(col("doc_id"), col("text").as("__text")))
      .select(col("doc_id"),
        graft.operators.Dedup.tokenHashesFromText(col("__text")).as("__th"))
      .select(col("doc_id"),
        graft.operators.Dedup.shingleHashesFromTokenHashes(col("__th"), 3).as("shd"))
      .withColumn("sig", graft.operators.Dedup.minhashSignature(col("shd")))
    def pairsOver(prepared: org.apache.spark.sql.DataFrame) = {
      val bands = prepared.select(col("doc_id"),
        explode(graft.operators.Dedup.lshBandKeys(col("sig"))).as("band_key"))
      bands.as("x")
        .join(bands.as("y"),
          col("x.band_key") === col("y.band_key") && col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("a"), col("y.doc_id").as("b")).distinct()
        .join(prepared.select(col("doc_id").as("a"), col("shd").as("shd_a")), "a")
        .join(prepared.select(col("doc_id").as("b"), col("shd").as("shd_b")), "b")
        .withColumn("j", graft.operators.Dedup.jaccard(col("shd_a"), col("shd_b")))
        .filter(col("j") >= 0.5).select(col("a"), col("b"), col("j"))
    }
    run("lsh-ckpt") {
      graft.operators.Dedup.lshNearDupPairs(t.documents, "doc_id", "text", 0.5)
    }
    if (only.isEmpty || only.exists("lsh-store-cold".contains)) {
      // the write is part of the measured first pass, so this leg times
      // it inline (run()'s noop sink would skip the write cost)
      def coldOnce(): Double = {
        val t0 = System.nanoTime()
        sigTable.write.mode("overwrite").parquet(sigDir)
        pairsOver(spark.read.parquet(sigDir))
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      coldOnce(); graft.Bench.quiesce(spark); System.gc()
      val times = Seq.fill(5)(coldOnce()).sorted
      println(f"[ab] ${"lsh-store-cold"}%-28s ${times(2)}%.3f s (median of 5: ${times.map(x => f"$x%.3f").mkString(", ")})")
    }
    run("lsh-store-warm") {
      pairsOver(spark.read.parquet(sigDir))
    }
    spark.stop()
  }
}
