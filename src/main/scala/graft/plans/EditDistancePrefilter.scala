package graft.plans

import graft.functions.DamerauLevenshteinExpr
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: prefix bounded edit-distance predicates with the
  * classic length-difference prune,
  *
  * {{{ levenshtein(a, b) <= k  ⇒  abs(length(a) - length(b)) <= k AND levenshtein(a, b) <= k }}}
  *
  * Both Levenshtein and (unrestricted) Damerau–Levenshtein satisfy
  * `dist(a, b) ≥ |len(a) − len(b)|` — every insert/delete changes the
  * length by exactly 1, substitutions and transpositions by 0 — so the
  * guard is a NECESSARY condition and the conjunction is
  * result-identical. `And` short-circuits in both interpreted and
  * generated code, so the O(|a|·|b|) DP is skipped for every pair the
  * O(1) length test already rejects. On a similarity self-join (the
  * shape `str_levenshtein_nations` / entity blocking runs at scale)
  * that is most pairs: lengths concentrate, but the prune rejects the
  * cross-length-bucket majority before any DP cell is touched.
  *
  * The match is deliberately conservative: a 2-argument distance (the
  * 3-argument thresholded `levenshtein(a, b, k)` is already banded —
  * nothing to add) compared with `<=` / `<` against a non-negative
  * integer LITERAL, in either operand order, inside a `Filter` or a
  * `Join` condition (after predicate pushdown the blocking predicate
  * usually lives in the join condition). Non-literal bounds and
  * reversed inequalities (`dist >= k` — the guard direction would be
  * unsound) are left untouched.
  *
  * Runs inside a fixed-point optimizer batch, so the rewrite is
  * idempotent: a comparison whose conjunction already contains the
  * semantically-equal guard is skipped.
  *
  * Nulls: `length(NULL)` → NULL makes the guard NULL exactly when the
  * distance is NULL; `And(NULL, NULL) = NULL` and both are dropped by
  * Filter/Join semantics, so null behavior is unchanged.
  */
object EditDistancePrefilter extends Rule[LogicalPlan] with PredicateHelper {

  /** Idempotently append this rule to a live session's experimental
    * optimizations (the no-extensions path; extension-built sessions
    * get it via [[graft.GraftExtensions]]). */
  def installOn(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(this))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, _) =>
      val next = addGuards(cond)
      if (next fastEquals cond) f else f.copy(condition = next)
    case j @ Join(_, _, _, Some(cond), _) =>
      val next = addGuards(cond)
      if (next fastEquals cond) j else j.copy(condition = Some(next))
  }

  private def addGuards(cond: Expression): Expression = rewrite(cond, Nil)

  /** Recursive descent carrying `visible` — the conjuncts of every
    * enclosing `And` chain. Only those conjuncts can short-circuit the
    * DP before it runs (codegen evaluates a dominating `And`'s guard
    * first), so only they count for the idempotence check: a
    * semantically-equal guard buried in a sibling `Or` disjunct does
    * NOT protect this comparison and must not suppress the rewrite.
    * `And` shape is preserved node-by-node (no split/reduce
    * re-association) so a no-op pass returns a `fastEquals` tree. */
  private def rewrite(e: Expression, visible: Seq[Expression]): Expression = e match {
    case a @ And(l, r) =>
      val vis = visible ++ splitConjunctivePredicates(a)
      val nl  = rewrite(l, vis)
      val nr  = rewrite(r, vis)
      if ((nl fastEquals l) && (nr fastEquals r)) a else And(nl, nr)
    case cmp @ LessThanOrEqual(Distance(a, b), Literal(k: Int, IntegerType)) if k >= 0 =>
      guarded(cmp, a, b, k, visible)
    case cmp @ LessThan(Distance(a, b), Literal(k: Int, IntegerType)) if k >= 1 =>
      guarded(cmp, a, b, k - 1, visible)
    case cmp @ GreaterThanOrEqual(Literal(k: Int, IntegerType), Distance(a, b)) if k >= 0 =>
      guarded(cmp, a, b, k, visible)
    case cmp @ GreaterThan(Literal(k: Int, IntegerType), Distance(a, b)) if k >= 1 =>
      guarded(cmp, a, b, k - 1, visible)
    case other =>
      other.mapChildren(rewrite(_, visible))
  }

  /** `abs(length(a) - length(b)) <= limit AND cmp`, unless a
    * dominating conjunct already carries that guard (fixed-point
    * idempotence — scoped to the enclosing `And` chain, not the whole
    * condition tree). */
  private def guarded(
      cmp: Expression,
      a: Expression,
      b: Expression,
      limit: Int,
      visible: Seq[Expression],
  ): Expression = {
    val guard = LessThanOrEqual(Abs(Subtract(Length(a), Length(b))), Literal(limit))
    if (visible.exists(_.semanticEquals(guard))) cmp else And(guard, cmp)
  }

  /** A 2-argument bounded-edit-distance expression (character-count
    * semantics shared by both: `dist ≥ |Δ code points|`). */
  private object Distance {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case Levenshtein(a, b, None)       => Some((a, b))
      case DamerauLevenshteinExpr(a, b)  => Some((a, b))
      case _                             => None
    }
  }
}
