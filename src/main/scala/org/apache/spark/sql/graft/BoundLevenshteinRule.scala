package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}
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
  *
  * A second pass PROPAGATES proven bounds upward: in
  * `SELECT levenshtein(a,b) ... WHERE levenshtein(a,b) <= k`, the
  * projection only ever evaluates on rows the filter below already
  * proved are within k — where the bounded kernel returns the identical
  * exact distance — so the projection's full-matrix DP becomes the
  * banded one too (the natural report-the-distance query then never
  * runs an unbounded DP at all).
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

  /** Bounds a conjunct of a Filter condition proves: from the already-
    * rewritten `bounded(k) >= 0` / `bounded(k) = k` shapes AND the
    * not-yet-rewritten comparison shapes, `(l, r, k)` such that every
    * row passing the filter satisfies `levenshtein(l, r) <= k`.
    */
  private def provenBounds(cond: Expression): Seq[(Expression, Expression, Int)] = {
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(a, b) => conjuncts(a) ++ conjuncts(b)
      case other => Seq(other)
    }
    conjuncts(cond).flatMap {
      case GreaterThanOrEqual(Levenshtein(l, r, Some(IntLit(k))), IntLit(0)) =>
        Some((l, r, k))
      // k2 must be a REACHABLE in-bound distance: `bounded(k) = -1`
      // selects exactly the rows with distance > k, so a negative k2
      // proves the opposite of a bound and must not propagate.
      case EqualTo(Levenshtein(l, r, Some(IntLit(k))), IntLit(k2))
          if k2 >= 0 && k2 <= k =>
        Some((l, r, k))
      case LessThanOrEqual(Unbounded(l, r), IntLit(k)) if k >= 0 =>
        Some((l, r, k))
      case GreaterThanOrEqual(IntLit(k), Unbounded(l, r)) if k >= 0 =>
        Some((l, r, k))
      case LessThan(Unbounded(l, r), IntLit(k)) if k >= 1 =>
        Some((l, r, k - 1))
      case GreaterThan(IntLit(k), Unbounded(l, r)) if k >= 1 =>
        Some((l, r, k - 1))
      case EqualTo(Unbounded(l, r), IntLit(k)) if k >= 0 => Some((l, r, k))
      case EqualTo(IntLit(k), Unbounded(l, r)) if k >= 0 => Some((l, r, k))
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // pass 2 — bound propagation: a projection's UNBOUNDED levenshtein
    // is only evaluated on rows the Filter below already proved are
    // within k, where the bounded kernel returns the identical exact
    // distance — so the full-matrix DP above a guarded filter is free
    // to become the banded one.
    val propagated = plan.transformUp {
      case p @ Project(projList, f @ Filter(cond, _)) =>
        val bounds = provenBounds(cond)
        if (bounds.isEmpty) p
        else {
          val newList = projList.map(_.transformDown {
            case lev @ Levenshtein(l, r, None) =>
              bounds.collectFirst {
                case (bl, br, k)
                    if bl.semanticEquals(l) && br.semanticEquals(r) =>
                  bounded(l, r, k)
              }.getOrElse(lev)
          }.asInstanceOf[NamedExpression])
          Project(newList, f)
        }
    }
    propagated.transformAllExpressions {
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
}
