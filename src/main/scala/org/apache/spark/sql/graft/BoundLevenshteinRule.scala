package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Rewrites comparisons of UNBOUNDED `levenshtein(l, r)` against a
  * non-negative integer literal into the threshold-bounded form —
  * `levenshtein(l, r) <= k` becomes `levenshtein(l, r, k) >= 0` — so a
  * user writing the natural SQL predicate gets the banded
  * O(k·min(n,m)) early-abandon kernel instead of the full O(n·m)
  * matrix, the same kernel [[graft.llm.EditDistanceDedupPipe]] calls
  * explicitly. On kilobyte documents with small k this is a 50-100×
  * per-pair cut, and it reaches scan-level DataFilters untouched.
  *
  * Semantics are exactly preserved: with threshold k the kernel returns
  * the true distance when it is ≤ k and −1 otherwise, so
  * `d ≤ k ⇔ bounded(k) ≥ 0`, `d < k ⇔ bounded(k−1) ≥ 0` (k ≥ 1), and
  * `d = k ⇔ bounded(k) = k`; NULL inputs stay NULL through both forms.
  * Comparisons against negative literals, non-literal bounds, or an
  * already-bounded call are left untouched. The rewritten node carries a
  * defined threshold, so the rule is idempotent by construction.
  */
object BoundLevenshteinRule extends Rule[LogicalPlan] {

  private object Unbounded {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case Levenshtein(l, r, None) => Some((l, r))
      case _ => None
    }
  }

  private object IntLit {
    def unapply(e: Expression): Option[Int] = e match {
      case Literal(v: Int, IntegerType) => Some(v)
      case _ => None
    }
  }

  private def bounded(l: Expression, r: Expression, k: Int): Expression =
    Levenshtein(l, r, Some(Literal(k)))

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // d <= k  /  k >= d
      case LessThanOrEqual(Unbounded(l, r), IntLit(k)) if k >= 0 =>
        GreaterThanOrEqual(bounded(l, r, k), Literal(0))
      case GreaterThanOrEqual(IntLit(k), Unbounded(l, r)) if k >= 0 =>
        GreaterThanOrEqual(bounded(l, r, k), Literal(0))
      // d < k  /  k > d   (k >= 1 so the shifted bound stays valid)
      case LessThan(Unbounded(l, r), IntLit(k)) if k >= 1 =>
        GreaterThanOrEqual(bounded(l, r, k - 1), Literal(0))
      case GreaterThan(IntLit(k), Unbounded(l, r)) if k >= 1 =>
        GreaterThanOrEqual(bounded(l, r, k - 1), Literal(0))
      // d = k (either operand order)
      case EqualTo(Unbounded(l, r), IntLit(k)) if k >= 0 =>
        EqualTo(bounded(l, r, k), Literal(k))
      case EqualTo(IntLit(k), Unbounded(l, r)) if k >= 0 =>
        EqualTo(bounded(l, r, k), Literal(k))
    }
}
