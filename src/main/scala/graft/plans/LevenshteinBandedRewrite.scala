package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: rewrite unbounded `levenshtein(a, b) <= k` comparisons
  * (in filters and join conditions) to the THRESHOLD form
  * `levenshtein(a, b, k) >= 0`.
  *
  * Spark's thresholded Levenshtein runs the banded DP — O(k·min(|a|,|b|))
  * instead of O(|a|·|b|) — and returns −1 when the distance exceeds the
  * threshold, so `d(a,b) ≤ k  ⇔  d_k(a,b) ≥ 0` exactly (NULL inputs yield
  * NULL under both forms). Users write the natural predicate; the rule
  * installs the bounded kernel — the cost difference is the predicate's k
  * versus the strings' full length, which on a fuzzy join's verify stage
  * is the dominant term. Registered via
  * [[graft.GraftExtensions]]`.injectOptimizerRule`; idempotent because the
  * rewritten form no longer matches the `threshold = None` pattern. */
object LevenshteinBandedRewrite extends Rule[LogicalPlan] {

  private def rewrite(cond: Expression): Expression = cond.transformUp {
    case LessThanOrEqual(Levenshtein(l, r, None), k @ Literal(_, IntegerType)) =>
      GreaterThanOrEqual(Levenshtein(l, r, Some(k)), Literal(0))
    case GreaterThanOrEqual(k @ Literal(_, IntegerType), Levenshtein(l, r, None)) =>
      GreaterThanOrEqual(Levenshtein(l, r, Some(k)), Literal(0))
    case LessThan(Levenshtein(l, r, None), Literal(k: Int, IntegerType)) if k > 0 =>
      GreaterThanOrEqual(Levenshtein(l, r, Some(Literal(k - 1))), Literal(0))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val c2 = rewrite(cond)
      if (c2 fastEquals cond) f else Filter(c2, child)
    case j @ Join(_, _, _, Some(cond), _) =>
      val c2 = rewrite(cond)
      if (c2 fastEquals cond) j else j.copy(condition = Some(c2))
  }
}
