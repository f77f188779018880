package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Levenshtein, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: rewrite un-thresholded `levenshtein(a, b) <= k`
  * comparisons into the early-exit threshold form
  * `levenshtein(a, b, k) >= 0`.
  *
  * The plain form computes the full O(|a|·|b|) dynamic program and then
  * compares; the threshold form abandons a pair the moment the running
  * distance bound exceeds k — O(k·min(|a|,|b|)) per pair. In a blocked
  * fuzzy-match join (queries/DedupOps.dedupFuzzyName) that is the
  * difference between the pair stage scaling with k·len and len² at
  * 100 TB; users writing the natural SQL (`WHERE levenshtein(a,b) <= 1`)
  * get the fast form without knowing the trick.
  *
  * Contract (Spark's documented threshold semantics): with threshold k,
  * the result is the distance when it is <= k, and -1 otherwise; NULL
  * inputs yield NULL either way. So for non-negative literal k:
  * `lev(a,b) <= k  ⇔  lev(a,b,k) >= 0` and
  * `lev(a,b) < k   ⇔  lev(a,b,k-1) >= 0` (k >= 1). Mirrored operand
  * orders are handled; non-literal or negative bounds are left alone.
  * Registered via GraftExtensions.injectOptimizerRule.
  */
object ThresholdLevenshtein extends Rule[LogicalPlan] {
  private def nonNegLit(e: Expression): Option[Int] = e match {
    case Literal(k: Int, IntegerType) if k >= 0 => Some(k)
    case _ => None
  }

  private def thresholded(l: Levenshtein, k: Int): Expression =
    GreaterThanOrEqual(
      Levenshtein(l.left, l.right, Some(Literal(k))), Literal(0))

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // lev(a,b) <= k  /  k >= lev(a,b)
      case LessThanOrEqual(l @ Levenshtein(_, _, None), e)
          if nonNegLit(e).isDefined =>
        thresholded(l, nonNegLit(e).get)
      case GreaterThanOrEqual(e, l @ Levenshtein(_, _, None))
          if nonNegLit(e).isDefined =>
        thresholded(l, nonNegLit(e).get)
      // lev(a,b) < k  /  k > lev(a,b)   (k >= 1 so k-1 stays valid)
      case LessThan(l @ Levenshtein(_, _, None), e)
          if nonNegLit(e).exists(_ >= 1) =>
        thresholded(l, nonNegLit(e).get - 1)
      case GreaterThan(e, l @ Levenshtein(_, _, None))
          if nonNegLit(e).exists(_ >= 1) =>
        thresholded(l, nonNegLit(e).get - 1)
    }
}
