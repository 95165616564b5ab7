package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, AttributeReference, BindReferences, Descending,
  Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder,
  UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftbridge.PlanBridge

/** Native as-of join — the engine's whole-operator Catalyst extension
  * (SURVEY.md §2C joins row), completing the customization ladder next to
  * the codegen Expressions (IsoMicrosTrim, MinHash/SimHash, Hilbert) and
  * the optimizer Rule (LevenshteinThresholdRule): a custom LOGICAL node
  * ([[AsOfJoinPlan]]) planned by an injected STRATEGY ([[AsOfJoinStrategy]],
  * registered via SparkSessionExtensions.injectPlannerStrategy in
  * [[GraftExtensions]]) into a custom PHYSICAL operator ([[AsOfJoinExec]]).
  *
  * Semantics (identical to `operators/AsOf.nearestEarlier`, spec-pinned by
  * AsOfNativeSpec): for each left row, attach the right row's value columns
  * with the greatest right time STRICTLY earlier than the left time sharing
  * the key; among right rows tied on (key, time) the greatest value tuple
  * wins (the composed form's `__vals` total-order tiebreak, reproduced here
  * by sorting the right child on the value columns too).
  *
  * Why a physical operator when the composed form already works: the
  * union+window plan pays (a) a UNION of both inputs through one shuffle —
  * every left row is widened with null value slots BEFORE the exchange, so
  * the shuffle moves left+right rows in the widened schema — and (b) a
  * window's buffered-frame machinery for what is a single carried value.
  * This exec shuffles each side in its OWN schema (ClusteredDistribution
  * on the key, the same requirement SortMergeJoin declares, so
  * EnsureRequirements co-partitions and AQE treats it like any shuffled
  * binary node) and replaces the window with a one-pointer merge: per
  * partition, one pass over both sorted streams carrying ONE copied value
  * row. Cost at 100 TB: two key-hash exchanges + two in-partition sorts —
  * the sort-merge-join floor — with O(1) state per partition.
  *
  * Null semantics (r11, closing the r10 ADVICE): SQL as-of semantics —
  * null keys and null times match NOTHING, never each other. Enforced in
  * two places rather than assumed: [[NativeAsOf.build]] inserts an
  * IsNotNull filter over the right child when its key/time are nullable
  * (a right row with a null key or time can match no left row, so the
  * filter is semantics-preserving and keeps such rows out of the
  * natural-ordering merge, where nulls-first would have let them pair
  * with null left keys); the merge itself emits the null match tuple for
  * any left row whose key or time is null (left rows are KEPT —
  * left-join semantics — just never matched; previously a null left time
  * in forward mode silently matched the key's first right row, and in
  * nearest mode threw from the distance arithmetic). `mode = "nearest"`
  * additionally validates AT CONSTRUCTION that both time columns are
  * timestamp/integral (its distance arithmetic needs exact longs) — a
  * plan-build IllegalArgumentException instead of a runtime one from a
  * task.
  */
object NativeAsOf {

  /** Backward as-of via the native operator; output schema matches
    * `AsOf.nearestEarlier` (left columns ++ asof_<value> columns).
    */
  def backward(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, valueCols: Seq[String]): DataFrame =
    build(left, right, key, leftTime, rightTime, valueCols, mode = "backward")

  /** Tolerance-bounded backward as-of (r12 verdict task 5): the backward
    * match only counts while it is FRESH — `leftTime − matchTime ≤
    * tolerance` (inclusive), in the time column's own unit (µs for
    * timestamps, the raw value for integral times). The ML
    * feature-freshness contract: a stale reading becomes the NULL match
    * tuple, it never silently joins. Implemented as one extra long
    * comparison on the CARRIED candidate inside the merge — same
    * two-exchange plan, same O(1) per-partition state — where the
    * composed form (q_join_asof_tolerance) pays a post-window null-out
    * projection over the widened union. Times must be timestamp/integral
    * (validated at construction, like `nearest`) because the staleness
    * arithmetic needs exact longs.
    */
  def backwardTolerance(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, valueCols: Seq[String],
      tolerance: Long): DataFrame = {
    require(tolerance >= 0, s"as-of tolerance must be >= 0, got $tolerance")
    build(left, right, key, leftTime, rightTime, valueCols,
      mode = "backward", tolerance = Some(tolerance))
  }

  /** Forward as-of (smallest right time STRICTLY later; (key, time) ties
    * resolve to the greatest value tuple — `AsOf.nearestLater`'s
    * contract). Same two-exchange merge shape; the right child sorts its
    * value columns DESCENDING so the first qualifying row peeked is the
    * tie winner, and the merge only ever PEEKS (several left rows may
    * share one forward match).
    */
  def forward(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, valueCols: Seq[String]): DataFrame =
    build(left, right, key, leftTime, rightTime, valueCols, mode = "forward")

  /** Nearest as-of in EITHER direction (`AsOf.nearest`'s contract: min
    * |Δt|, the earlier row wins an exact two-sided tie, a same-instant
    * row wins outright). One merge pass holds BOTH candidates — the
    * carried backward row and the peeked forward row — and picks by
    * exact integer distance, so times must be TimestampType or integral
    * (the same precondition the composed form documents).
    */
  def nearest(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, valueCols: Seq[String]): DataFrame =
    build(left, right, key, leftTime, rightTime, valueCols, mode = "nearest")

  private def build(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, valueCols: Seq[String],
      mode: String, tolerance: Option[Long] = None): DataFrame = {
    // extension-registered sessions (Graft.session) already carry the
    // strategy; foreign sessions (the driver's Verify, bare test sessions)
    // get it injected idempotently here
    PlanBridge.ensureStrategy(left.sparkSession, AsOfJoinStrategy)
    if (mode == "nearest" || tolerance.isDefined) {
      // fail at plan construction, not from a task mid-job (r10 ADVICE)
      val what = if (mode == "nearest") "nearest" else "tolerance-bounded"
      import org.apache.spark.sql.types._
      def integral(side: String, df: DataFrame, name: String): Unit = {
        val dt = df.schema(name).dataType
        dt match {
          case TimestampType | TimestampNTZType | DateType |
               LongType | IntegerType | ShortType => ()
          case other => throw new IllegalArgumentException(
            s"$what as-of needs timestamp/integral time columns for its " +
              s"exact distance arithmetic; $side time column '$name' is $other")
        }
      }
      integral("left", left, leftTime)
      integral("right", right, rightTime)
    }
    // cross-side type equality, also at construction (the IntervalJoin
    // twin of this check): the exec orders both sides' keys and times with
    // ONE natural ordering built from the left attribute's type, so a
    // mismatch would mis-order or throw mid-merge instead of failing here
    require(left.schema(key).dataType == right.schema(key).dataType,
      s"as-of key types differ: left '$key' is " +
        s"${left.schema(key).dataType.sql}, right is " +
        s"${right.schema(key).dataType.sql}")
    require(left.schema(leftTime).dataType == right.schema(rightTime).dataType,
      s"as-of time types differ: '$leftTime' is " +
        s"${left.schema(leftTime).dataType.sql}, '$rightTime' is " +
        s"${right.schema(rightTime).dataType.sql}")
    val lPlan = PlanBridge.analyzed(left)
    // self-join guard: when both inputs derive from one DataFrame (events
    // as-of events), the right plan's key/time attributes can carry the
    // SAME exprIds as the left's; the analyzer's DeduplicateRelations then
    // rewrites the right SUBTREE to fresh ids but cannot know this node's
    // right-side fields meant the right child (the ids are ambiguous by
    // definition) and leaves them stale — the !Sort/!Exchange invalid-plan
    // class. A fresh Alias on every right column gives the node
    // collision-free attributes to reference; dedup of the subtree below
    // the aliases stays internally consistent.
    import org.apache.spark.sql.functions.col
    val rAliased0 = right.select(right.columns.toSeq.map(c => col(c).as(c)): _*)
    // a right row with a null key or time matches no left row under SQL
    // as-of semantics — filter them out BEFORE the natural-ordering merge,
    // where nulls-first would otherwise pair them with null left keys
    // (see the null-semantics scaladoc above); no-op when the schema
    // already guarantees non-null
    val rAliased =
      if (rAliased0.schema(key).nullable || rAliased0.schema(rightTime).nullable)
        rAliased0.filter(col(key).isNotNull && col(rightTime).isNotNull)
      else rAliased0
    val rPlan = PlanBridge.analyzed(rAliased)
    def attr(p: LogicalPlan, name: String): Attribute =
      p.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"no column $name in ${p.output.map(_.name)}"))
    val values = valueCols.map(attr(rPlan, _))
    val matched = values.map(v =>
      AttributeReference(s"asof_${v.name}", v.dataType, nullable = true)())
    val node = AsOfJoinPlan(lPlan, rPlan,
      attr(lPlan, key), attr(rPlan, key),
      attr(lPlan, leftTime), attr(rPlan, rightTime), values, matched, mode,
      tolerance)
    PlanBridge.ofRows(left.sparkSession, node)
  }
}

/** Logical as-of join node. Constructed only over ANALYZED children (all
  * attributes resolved), so the analyzer has nothing left to do; unknown
  * to every optimizer rewrite, it passes through optimization untouched
  * and is planned solely by [[AsOfJoinStrategy]].
  */
final case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTime: Attribute, rightTime: Attribute,
    rightValues: Seq[Attribute], matched: Seq[Attribute],
    mode: String = "backward",
    tolerance: Option[Long] = None) extends BinaryNode {

  override def output: Seq[Attribute] = left.output ++ matched

  // the asof_* attributes are GENERATED by this node, not referenced from
  // children — without this, CheckAnalysis reports them missing from input
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(matched)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] into [[AsOfJoinExec]]. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: AsOfJoinPlan =>
      AsOfJoinExec(planLater(p.left), planLater(p.right),
        p.leftKey, p.rightKey, p.leftTime, p.rightTime,
        p.rightValues, p.matched, p.mode, p.tolerance) :: Nil
    case _ => Nil
  }
}

/** Sort-merge as-of exec: children hash-clustered on the key and sorted by
  * (key, time[, values…]); one streaming pass per partition carries the
  * latest qualifying right value row.
  */
final case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTime: Attribute, rightTime: Attribute,
    rightValues: Seq[Attribute], matched: Seq[Attribute],
    mode: String = "backward",
    tolerance: Option[Long] = None) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ matched

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(matched)

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKey :: Nil) :: ClusteredDistribution(rightKey :: Nil) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    // value columns in the right ordering make the (key, time) tie winner
    // deterministic — the greatest value tuple, the composed forms'
    // __vals tiebreak: backward consumes rows and keeps the LAST (values
    // ascending), forward PEEKS the first qualifying row (values
    // descending)
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)) ++
      rightValues.map(SortOrder(_, if (mode == "forward") Descending else Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val keyType = leftKey.dataType
    val timeType = leftTime.dataType
    val valueExprs: Seq[Expression] = rightValues
    val matchedAttrs = matched
    val outAttrs = output
    val lKeyExpr = BindReferences.bindReference(leftKey: Expression, lOut)
    val lTimeExpr = BindReferences.bindReference(leftTime: Expression, lOut)
    val rKeyExpr = BindReferences.bindReference(rightKey: Expression, rOut)
    val rTimeExpr = BindReferences.bindReference(rightTime: Expression, rOut)
    val boundValues = valueExprs.map(BindReferences.bindReference(_, rOut))

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(Seq(keyType))
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(timeType))
      val lKeyProj = UnsafeProjection.create(Seq(lKeyExpr))
      val lTimeProj = UnsafeProjection.create(Seq(lTimeExpr))
      val rKeyProj = UnsafeProjection.create(Seq(rKeyExpr))
      val rTimeProj = UnsafeProjection.create(Seq(rTimeExpr))
      val valueProj = UnsafeProjection.create(boundValues)
      val resultProj = UnsafeProjection.create(outAttrs, lOut ++ matchedAttrs)
      val nullVals = new GenericInternalRow(matchedAttrs.size)
      val joined = new JoinedRow

      // single-row lookahead over the right stream; sorted-exec rows are
      // REUSED buffers, so the held head must be a copy
      var rHead: InternalRow = null
      def advance(): Unit =
        rHead = if (rIter.hasNext) rIter.next().copy() else null
      advance()

      var lastKey: UnsafeRow = null   // copied key of the carried right row
      var lastVals: UnsafeRow = null  // copied value tuple of that row

      // exact-long time extraction for the distance/staleness arithmetic
      // (nearest and tolerance modes; construction validated the types)
      def asLong(a: Any): Long = a match {
        case l: java.lang.Long => l
        case i: java.lang.Integer => i.toLong
        case s: java.lang.Short => s.toLong
        case other => throw new IllegalArgumentException(
          s"as-of distance arithmetic needs integral/timestamp times, got $other")
      }

      // SQL null semantics for the LEFT side: a null key or time matches
      // nothing (the row itself is kept — left join). Null left rows sort
      // first within the (key, time) ordering, so skipping the right-stream
      // advance for them loses no later matches.
      def leftNull(l: InternalRow): Boolean =
        lKeyProj(l).isNullAt(0) || lTimeProj(l).isNullAt(0)

      if (mode == "forward") {
        // forward merge: PEEK the first right row with same key and time
        // STRICTLY later (values sort descending, so the peeked row is the
        // tie winner); never consume on match — several left rows can
        // share one forward match
        lIter.map { l =>
          if (leftNull(l)) resultProj(joined(l, nullVals))
          else {
          val lt = lTimeProj(l)
          var continue = rHead != null
          while (continue) {
            val c = keyOrd.compare(rKeyProj(rHead), lKeyProj(l))
            if (c < 0 || (c == 0 && timeOrd.compare(rTimeProj(rHead), lt) <= 0)) {
              advance()
              continue = rHead != null
            } else continue = false
          }
          val m: InternalRow =
            if (rHead != null && keyOrd.compare(rKeyProj(rHead), lKeyProj(l)) == 0)
              valueProj(rHead)
            else nullVals
          resultProj(joined(l, m))
          }
        }
      } else if (mode == "nearest") {
        // both candidates in one pass: the CARRIED backward row (greatest
        // time ≤ left time — same-instant included, it wins at distance 0)
        // and the PEEKED forward row (smallest time strictly later). Pick
        // by exact integer distance, backward winning the two-sided tie —
        // AsOf.nearest's contract. Distance arithmetic needs integral
        // times (TimestampType evaluates to µs longs).
        var lastTime = 0L
        val lTimeGet = lTimeExpr
        val rTimeGet = rTimeExpr
        lIter.map { l =>
          if (leftNull(l)) resultProj(joined(l, nullVals))
          else {
          val lt = asLong(lTimeGet.eval(l))
          var continue = rHead != null
          while (continue) {
            val c = keyOrd.compare(rKeyProj(rHead), lKeyProj(l))
            if (c < 0 || (c == 0 && asLong(rTimeGet.eval(rHead)) <= lt)) {
              lastKey = rKeyProj(rHead).copy()
              lastVals = valueProj(rHead).copy()
              lastTime = asLong(rTimeGet.eval(rHead))
              advance()
              continue = rHead != null
            } else continue = false
          }
          val hasBack = lastKey != null && keyOrd.compare(lastKey, lKeyProj(l)) == 0
          val hasFwd = rHead != null && keyOrd.compare(rKeyProj(rHead), lKeyProj(l)) == 0
          val m: InternalRow =
            if (hasBack && hasFwd) {
              if (lt - lastTime <= asLong(rTimeGet.eval(rHead)) - lt) lastVals
              else valueProj(rHead)
            } else if (hasBack) lastVals
            else if (hasFwd) valueProj(rHead)
            else nullVals
          resultProj(joined(l, m))
          }
        }
      } else {
        // backward merge, optionally tolerance-bounded: consume every
        // right row before (key, time) of this left row; the last one
        // consumed per key is the as-of match candidate. With a tolerance
        // (r12 verdict task 5), the candidate only matches while FRESH —
        // leftTime − matchTime ≤ tol, inclusive, exact longs — ONE extra
        // comparison on the carried candidate, no extra state; a stale
        // candidate emits the null tuple but is NOT discarded (a later
        // left row of the same key never needs an earlier candidate, so
        // the carry logic is unchanged).
        val hasTol = tolerance.isDefined
        val tol = tolerance.getOrElse(0L)
        var lastTime = 0L
        lIter.map { l =>
          if (leftNull(l)) resultProj(joined(l, nullVals))
          else {
          val lt = lTimeProj(l)
          // consume every right row before (key, time) of this left row;
          // the last one consumed per key is the as-of match candidate
          var continue = rHead != null
          while (continue) {
            val c = keyOrd.compare(rKeyProj(rHead), lKeyProj(l))
            if (c < 0 || (c == 0 && timeOrd.compare(rTimeProj(rHead), lt) < 0)) {
              lastKey = rKeyProj(rHead).copy()
              lastVals = valueProj(rHead).copy()
              if (hasTol) lastTime = asLong(rTimeExpr.eval(rHead))
              advance()
              continue = rHead != null
            } else continue = false
          }
          val m: InternalRow =
            if (lastKey != null && keyOrd.compare(lastKey, lKeyProj(l)) == 0 &&
                (!hasTol || asLong(lTimeExpr.eval(l)) - lastTime <= tol)) lastVals
            else nullVals
          resultProj(joined(l, m))
          }
        }
      }
    }
  }
}
