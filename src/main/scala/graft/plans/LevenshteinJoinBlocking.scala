package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Catalyst optimizer rule: derive length blocking for edit-distance joins.
  *
  * An inner join on `levenshtein(a, b) <= k` alone is a nested loop — every
  * left string against every right string, the naive ER query shape. But the
  * predicate IMPLIES `abs(length(a) − length(b)) <= k` (an edit changes the
  * length by at most 1), and that implied band is integral, so adding it as
  * a conjunct lets [[BandJoinRewrite]] — running in the same optimizer
  * fixed-point batch — quantize both lengths into k-buckets and execute a
  * HASH join with the banded-DP predicate as residual. Chain of three rules,
  * none knowing about the others:
  *
  *   `lev(a,b) <= k`                 (user's naive spelling)
  *     → `lev(a,b,k) >= 0`           ([[LevenshteinBandRewrite]], banded DP)
  *     → + `abs(len(a)−len(b)) <= k` (this rule, implied blocking key)
  *     → bucketed equi hash join     ([[BandJoinRewrite]], k-bucket explode)
  *
  * The result is exactly the hand-written blocking discipline of the ER pack
  * (er1 blocks, then bands) synthesized from the declarative predicate. The
  * added conjunct is implied by the original one, so results are unchanged;
  * a semantic-equality guard keeps the fixed point from stacking duplicates.
  */
object LevenshteinJoinBlocking extends Rule[LogicalPlan] with PredicateHelper {

  /** `injectOptimizerRule` target: `Session.builder.withExtensions(...)`. */
  val extension: SparkSessionExtensions => Unit =
    _.injectOptimizerRule(_ => LevenshteinJoinBlocking)

  /** (a, b, k) from a banded-lev conjunct `levenshtein(a, b, k) >= 0`,
    * either comparison orientation, k a non-negative integer literal.
    */
  private def bandedLev(c: Expression): Option[(Expression, Expression, Int)] =
    c match {
      case GreaterThanOrEqual(Levenshtein(a, b, Some(Literal(k: Int, _))),
          Literal(0, _)) if k >= 0 => Some((a, b, k))
      case LessThanOrEqual(Literal(0, _),
          Levenshtein(a, b, Some(Literal(k: Int, _)))) if k >= 0 =>
        Some((a, b, k))
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(l, r, Inner, Some(cond), hint) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val additions = conjuncts.flatMap(bandedLev).flatMap { case (a, b, k) =>
        val (ra, rb) = (a.references, b.references)
        val crossSides =
          (ra.subsetOf(l.outputSet) && rb.subsetOf(r.outputSet) ||
            ra.subsetOf(r.outputSet) && rb.subsetOf(l.outputSet)) &&
            ra.nonEmpty && rb.nonEmpty
        if (!crossSides) None
        else {
          val blocking = LessThanOrEqual(
            Abs(Subtract(Length(a), Length(b))), Literal(k))
          if (conjuncts.exists(_.semanticEquals(blocking))) None
          else Some(blocking)
        }
      }
      if (additions.isEmpty) j
      else Join(l, r, Inner, Some((conjuncts ++ additions).reduce(And)), hint)
  }
}
