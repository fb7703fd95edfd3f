package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Add, And, Attribute, AttributeReference, EqualTo, Explode, Expression, GreaterThanOrEqual, IntegralDivide, LessThan, LessThanOrEqual, Literal, PredicateHelper, Sequence}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Optimizer rewrite: BANDED RANGE JOINS.
  *
  * A join whose only predicate is an interval band
  * `p >= q + c1 AND p <(=) q + c2` has no equi-key, so Spark plans a
  * BroadcastNestedLoopJoin / CartesianProduct — O(n·m) pairs, the classic
  * scale-killer for point-in-interval joins. But the band has bounded
  * width W = c2 − c1: binning both sides by W turns it into an equi-join
  * on the bin (each interval overlaps ≤ 2 width-W bins, so the interval
  * side fans out ≤ 2×), with the original band predicate kept as the
  * exact post-filter. Pair generation becomes |points per bin| — the
  * same technique `ScalePipeline.q83RangeJoin` hand-writes, applied
  * automatically by the engine so users can write the declarative
  * inequality join.
  *
  * Scope guards (correctness-first):
  *  - INNER joins whose conjuncts contain the band shape on LONG
  *    expressions `p ∈ one side`, `q ∈ other side`, `c1/c2` literals
  *    (missing lower constant ⇒ c1 = 0);
  *  - no existing cross-side equi conjunct (with one, Spark already
  *    hash-joins on it and the band is a cheap residual filter);
  *  - truncating division is monotone, so bin(lo)..bin(hi) covers every
  *    point bin for ANY sign of the domain; null q ⇒ null sequence ⇒
  *    Explode emits nothing, matching inner-join null semantics.
  *
  * Idempotent under the optimizer's fixed-point: the rewrite introduces
  * a cross-side equi conjunct (`__graft_bin = p div W`), which the
  * no-equi guard sees on the next pass.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  private val BinCol = "__graft_bin"

  /** (point, intervalBase, constant) from one band conjunct. */
  private def bound(e: Expression): Option[(Expression, Expression, Long)] = e match {
    case cmp @ (_: GreaterThanOrEqual | _: LessThan | _: LessThanOrEqual) =>
      val (p, rhs) = (cmp.children(0), cmp.children(1))
      rhs match {
        case Add(q, Literal(c: Long, LongType), _) => Some((p, q, c))
        case q => Some((p, q, 0L))
      }
    case _ => None
  }

  private def sameSide(e: Expression, side: LogicalPlan): Boolean =
    e.references.nonEmpty && e.references.subsetOf(side.outputSet)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner, Some(cond), hint)
        if !cond.references.exists(_.name == BinCol) =>
      val conjuncts = splitConjunctivePredicates(cond)

      val hasCrossEqui = conjuncts.exists {
        case EqualTo(a, b) =>
          (sameSide(a, left) && sameSide(b, right)) ||
            (sameSide(a, right) && sameSide(b, left))
        case _ => false
      }

      val lower = conjuncts.collectFirst {
        case g @ GreaterThanOrEqual(_, _) if bound(g).isDefined &&
          g.children.forall(_.dataType == LongType) => bound(g).get
      }
      val upper = conjuncts.collectFirst {
        case l @ (_: LessThan | _: LessThanOrEqual)
            if l.children.forall(_.dataType == LongType) &&
              bound(l).isDefined => bound(l).get
      }

      (lower, upper) match {
        case (Some((p1, q1, c1)), Some((p2, q2, c2)))
            if !hasCrossEqui && c2 > c1 &&
              p1.semanticEquals(p2) && q1.semanticEquals(q2) &&
              ((sameSide(p1, left) && sameSide(q1, right)) ||
                (sameSide(p1, right) && sameSide(q1, left))) =>
          val w = Literal(c2 - c1, LongType)
          val intervalOnLeft = sameSide(q1, left)
          val intervalSide = if (intervalOnLeft) left else right

          def bin(e: Expression): Expression = IntegralDivide(e, w)

          val binAttr: Attribute =
            AttributeReference(BinCol, LongType, nullable = false)()
          val gen = Generate(
            // Sequence is TimeZoneAwareExpression: it stays UNRESOLVED
            // without a timeZoneId even for integral sequences
            Explode(Sequence(
              bin(Add(q1, Literal(c1, LongType))),
              bin(Add(q1, Literal(c2, LongType))),
              Some(Literal(1L, LongType)),
              Some(conf.sessionLocalTimeZone))),
            unrequiredChildIndex = Nil, outer = false, qualifier = None,
            generatorOutput = Seq(binAttr), child = intervalSide)

          val newCond = And(EqualTo(binAttr, bin(p1)), cond)
          val newJoin =
            if (intervalOnLeft) Join(gen, right, Inner, Some(newCond), hint)
            else Join(left, gen, Inner, Some(newCond), hint)
          Project(j.output, newJoin)

        case _ => j
      }
  }
}
