package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Catalyst optimizer rule: band every thresholded edit-distance predicate.
  *
  * `levenshtein(a, b) <= k` computes the FULL O(|a|·|b|) dynamic program per
  * pair and then throws the distance away; Spark's 3-arg
  * `levenshtein(a, b, k)` (3.5+) runs the banded DP — O(k·n), early exit —
  * and returns −1 above the threshold, so the predicate is equivalent to
  * `levenshtein(a, b, k) >= 0`. The ER pack writes the banded form by hand
  * (`EntityResolution` er1/er5); this rule makes the naive spelling a user
  * would write just as fast, the same philosophy as [[BandJoinRewrite]]:
  * meet the declarative query where it is, and fix the plan underneath.
  *
  * Matched shapes (k any foldable non-negative integral literal; both
  * orientations):
  *   - `levenshtein(a, b) <= k`  → `levenshtein(a, b, k) >= 0`
  *   - `levenshtein(a, b) < k`   → `levenshtein(a, b, k−1) >= 0` (k ≥ 1)
  * Null semantics are unchanged: the 3-arg form is null exactly when the
  * 2-arg form is, and comparisons propagate null identically on both sides
  * of the rewrite. Equality/greater-than comparisons are left alone — they
  * need the true distance.
  */
object LevenshteinBandRewrite extends Rule[LogicalPlan] {

  /** `injectOptimizerRule` target: `Session.builder.withExtensions(...)`. */
  val extension: SparkSessionExtensions => Unit =
    _.injectOptimizerRule(_ => LevenshteinBandRewrite)

  private def intOf(e: Expression): Option[Long] =
    if (!e.foldable) None
    else e.eval() match {
      case i: java.lang.Integer => Some(i.longValue())
      case l: java.lang.Long => Some(l.longValue())
      case s: java.lang.Short => Some(s.longValue())
      case b: java.lang.Byte => Some(b.longValue())
      case _ => None
    }

  private def banded(a: Expression, b: Expression, k: Long): Expression =
    GreaterThanOrEqual(
      Levenshtein(a, b, Some(Literal(k.toInt))), Literal(0))

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case LessThanOrEqual(Levenshtein(a, b, None), kk)
          if intOf(kk).exists(k => k >= 0 && k <= Int.MaxValue) =>
        banded(a, b, intOf(kk).get)
      case GreaterThanOrEqual(kk, Levenshtein(a, b, None))
          if intOf(kk).exists(k => k >= 0 && k <= Int.MaxValue) =>
        banded(a, b, intOf(kk).get)
      case LessThan(Levenshtein(a, b, None), kk)
          if intOf(kk).exists(k => k >= 1 && k <= Int.MaxValue) =>
        banded(a, b, intOf(kk).get - 1)
      case GreaterThan(kk, Levenshtein(a, b, None))
          if intOf(kk).exists(k => k >= 1 && k <= Int.MaxValue) =>
        banded(a, b, intOf(kk).get - 1)
    }
}
