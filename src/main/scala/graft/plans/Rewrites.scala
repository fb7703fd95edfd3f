package graft.plans

import org.apache.spark.sql.catalyst.expressions.{ArrayDistinct, ArrayIntersect, Expression, Literal, Size, SortArray}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, BooleanType, StringType}

/** Optimizer rewrite: `size(array_intersect(a, b))` → the native
  * [[SortedIntersectSize]] merge walk, when BOTH inputs are provably
  * sorted distinct string arrays (literally `sort_array(array_distinct(_))`
  * subtrees — the only shape where the merge walk's precondition is
  * guaranteed by construction).
  *
  * This is the SURVEY §4 "optional Rule" slot: user code keeps the
  * declarative built-in formulation; the engine swaps in the O(n+m)
  * zero-allocation kernel. Injected by [[GraftExtensions]]
  * (`injectOptimizerRule`) or via `spark.experimental.extraOptimizations`.
  */
object IntersectSizeRewrite extends Rule[LogicalPlan] {

  private def sortedDistinctStrings(e: Expression): Boolean = e match {
    // ASCENDING only (the merge walk assumes it), and no null elements
    // (the walk compares strings directly)
    case SortArray(ArrayDistinct(c), Literal(true, BooleanType)) =>
      c.dataType match {
        case ArrayType(StringType, containsNull) => !containsNull
        case _ => false
      }
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case s @ Size(ArrayIntersect(a, b), _)
          if sortedDistinctStrings(a) && sortedDistinctStrings(b) &&
            !s.legacySizeOfNull =>
        SortedIntersectSize(a, b)
    }
}
