package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{
  Expression, GreaterThan, GreaterThanOrEqual, IntegerLiteral, LessThan,
  LessThanOrEqual, Levenshtein, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Catalyst optimizer rule: rewrite comparisons of an UN-thresholded
  * levenshtein against an integer bound into Spark's thresholded kernel.
  *
  * `levenshtein(a, b) <= k` computes the full O(|a|·|b|) dynamic program
  * and then throws most of it away; `levenshtein(a, b, k)` runs the
  * banded O(k·min(|a|,|b|)) variant that early-outs (returning -1) the
  * moment the distance provably exceeds k — including the free
  * length-difference gate. For the fuzzy-match/entity-resolution shape
  * (`q_str_distance`'s kernel under a small edit bound, usually inside a
  * blocked self-join) this is the difference between O(len²) and O(k·len)
  * per candidate pair, at 100 TB the dominant CPU term of the match
  * stage. Users write the natural predicate; the engine plans the banded
  * kernel.
  *
  * Equivalences (thresholded form returns the distance when ≤ t, else -1;
  * null inputs propagate null through both forms identically):
  *   lev(a,b) <= k  ⇔  lev(a,b,k)   >= 0
  *   lev(a,b) <  k  ⇔  lev(a,b,k-1) >= 0   (k >= 1)
  *   lev(a,b) >  k  ⇔  lev(a,b,k)   <  0
  *   lev(a,b) >= k  ⇔  lev(a,b,k-1) <  0   (k >= 1)
  * plus the literal-on-left mirror images. Negative k comparisons are left
  * untouched (constant-foldable anyway). The rule only matches
  * `threshold.isEmpty`, so its own output never re-matches — idempotent
  * under the optimizer's fixpoint by construction.
  *
  * Registered through [[GraftExtensions]] (spark.sql.extensions) for
  * deployments; specs drive it via `spark.experimental.extraOptimizations`
  * on a live session. Applies to any expression position the optimizer
  * visits — Filter predicates AND Join conditions.
  */
object LevenshteinThresholdRule extends Rule[LogicalPlan] {

  private def banded(a: Expression, b: Expression, t: Int): Expression =
    Levenshtein(a, b, Some(Literal(t)))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    // lev <= k  /  k >= lev
    case LessThanOrEqual(l @ Levenshtein(a, b, None), IntegerLiteral(k)) if k >= 0 =>
      GreaterThanOrEqual(banded(a, b, k), Literal(0))
    case GreaterThanOrEqual(IntegerLiteral(k), l @ Levenshtein(a, b, None)) if k >= 0 =>
      GreaterThanOrEqual(banded(a, b, k), Literal(0))
    // lev < k  /  k > lev
    case LessThan(l @ Levenshtein(a, b, None), IntegerLiteral(k)) if k >= 1 =>
      GreaterThanOrEqual(banded(a, b, k - 1), Literal(0))
    case GreaterThan(IntegerLiteral(k), l @ Levenshtein(a, b, None)) if k >= 1 =>
      GreaterThanOrEqual(banded(a, b, k - 1), Literal(0))
    // lev > k  /  k < lev
    case GreaterThan(l @ Levenshtein(a, b, None), IntegerLiteral(k)) if k >= 0 =>
      LessThan(banded(a, b, k), Literal(0))
    case LessThan(IntegerLiteral(k), l @ Levenshtein(a, b, None)) if k >= 0 =>
      LessThan(banded(a, b, k), Literal(0))
    // lev >= k  /  k <= lev
    case GreaterThanOrEqual(l @ Levenshtein(a, b, None), IntegerLiteral(k)) if k >= 1 =>
      LessThan(banded(a, b, k - 1), Literal(0))
    case LessThanOrEqual(IntegerLiteral(k), l @ Levenshtein(a, b, None)) if k >= 1 =>
      LessThan(banded(a, b, k - 1), Literal(0))
  }
}

/** Engine extension entry point: `--conf
  * spark.sql.extensions=graft.plans.GraftExtensions` injects the engine's
  * optimizer rules into every session of the deployment (SURVEY.md §4's
  * extension mechanism — rules ride the normal optimizer fixpoint, nothing
  * is hand-scheduled).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit = {
    extensions.injectOptimizerRule(_ => LevenshteinThresholdRule)
    // whole-operator extensions: plans graft.plans.AsOfJoinPlan into the
    // native sort-merge AsOfJoinExec, and graft.plans.IntervalJoinPlan
    // into the plane-sweep IntervalJoinExec
    extensions.injectPlannerStrategy(_ => AsOfJoinStrategy)
    extensions.injectPlannerStrategy(_ => IntervalJoinStrategy)
  }
}
