package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, BindReferences, Expression, JoinedRow, RowOrdering,
  SortOrder, UnsafeProjection}
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
  * State contract (r11 verdict task 3): the active set is an in-memory
  * buffer bounded by the maximum CONCURRENT-interval depth of a key — the
  * right structure for timeline data, where depth is physics (sessions
  * live minutes, campaigns weeks), but a pathological key whose intervals
  * all mutually overlap degenerates to O(m) heap on one task. Two
  * finishers turn that from a silent OOM-a-shift-later into an owned
  * contract, Guards-style:
  *
  *  - `maxDepth` SQLMetric — every task reports the deepest active set it
  *    held (size-stat metric, so the plan UI shows total/min/med/max
  *    across tasks); a healthy run reads orders of magnitude below the
  *    row count, a degenerating key stands out on one task;
  *  - [[IntervalJoinExec.MaxDepthKey]] session conf (default
  *    [[IntervalJoinExec.DefaultMaxDepth]], 0 or negative disables): when
  *    one key's active set would exceed it, the task fails with a NAMED
  *    IllegalStateException carrying the depth, the cap, and the
  *    remediations (bucket the key by coarse time so mutually-overlapping
  *    intervals split across finer keys; pre-merge right intervals that
  *    abut/overlap into spans; or raise the cap when the depth is truly
  *    legitimate and the executor heap is sized for it). The default is
  *    high enough that no real timeline hits it (1M concurrent intervals
  *    per single key ≈ hundreds of MB of buffered rows on ONE task —
  *    already a sizing smell) and low enough to fire well before the
  *    executor dies.
  */
final case class IntervalJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftLo: Attribute, leftHi: Attribute,
    rightLo: Attribute, rightHi: Attribute) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "maxDepth" -> SQLMetrics.createSizeMetric(sparkContext, "max active-set depth"))

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
    // primitives captured here so the task closure serializes the cap,
    // not the exec's SQLConf
    val depthCap = conf.getConfString(IntervalJoinExec.MaxDepthKey,
      IntervalJoinExec.DefaultMaxDepth.toString).toLong
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

      var rHead: InternalRow = null
      def advance(): Unit =
        rHead = if (rIter.hasNext) rIter.next().copy() else null
      advance()

      // active right intervals of the CURRENT key, in arrival (lo) order;
      // key of that set held alongside (copied — projection buffers reuse)
      val active = new scala.collection.mutable.ArrayBuffer[InternalRow]()
      var activeKey: InternalRow = null
      var taskMaxDepth = 0L

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
        // again. Single-pass compaction (copy survivors forward, truncate)
        // rather than remove(i): each remove shifts the tail, so a burst
        // of B expirations would cost O(B·d) in shifts; this is O(d) flat.
        // Eviction runs BEFORE ingest so the buffer never mixes the
        // previous left's dead intervals with this left's live ones: every
        // buffered row then overlaps the current [llo, lhi] window, which
        // makes the depth metric/guard below measure TRUE concurrent
        // depth (ingest-before-evict inflated it with up to one stale
        // active set — the code-review counterexample: 9 dead + 2 live
        // tripping a cap of 10 at true depth 2).
        var i = 0
        var keep = 0
        while (i < active.length) {
          if (timeOrd.compare(rHiProj(active(i)), llo) >= 0) {
            if (keep != i) active(keep) = active(i)
            keep += 1
          }
          i += 1
        }
        if (keep < active.length) active.dropRightInPlace(active.length - keep)
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
                    s"- the plane sweep's active set is O(depth) heap on one " +
                    s"task and this key is degenerating toward O(m). " +
                    s"Remediate: bucket the key by a coarse time column so " +
                    s"mutually-overlapping intervals split across keys, " +
                    s"pre-merge abutting/overlapping right intervals into " +
                    s"spans, or raise ${IntervalJoinExec.MaxDepthKey} (<=0 " +
                    s"disables) if the depth is legitimate and executors are " +
                    s"sized for it.")
              active += rHead
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
        // active is lo-sorted; rows ingested for an EARLIER left (whose hi
        // exceeded this one's) may start after this left ends — emit only
        // the lo <= lhi prefix (the rest stays for later lefts)
        active.iterator
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
}
