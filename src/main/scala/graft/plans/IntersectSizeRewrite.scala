package graft.plans

import graft.functions.HashExpressions.IntersectSize
import org.apache.spark.sql.catalyst.expressions.{ArrayIntersect, Expression, Size}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, StringType}

/** Optimizer rule: `size(array_intersect(a, b))` → [[IntersectSize]].
  *
  * The Jaccard family (`|A ∩ B| / (|A| + |B| - |A ∩ B|)`) is written
  * declaratively with builtins; the builtin pair materializes the
  * intersection array per row only to count it — on near-dup
  * verification joins that is an allocation per candidate pair.
  * This rule swaps in a count-only kernel (hash-set membership scan)
  * whenever the pattern appears, without any query changing its code:
  * the (c)-tier Catalyst extension point
  * (`SparkSessionExtensions.injectOptimizerRule` via
  * [[graft.GraftExtensions]]).
  *
  * Guards: string element type, no null elements (shingle arrays —
  * exactly what Jaccard runs on), and non-legacy size(null) semantics,
  * so the rewrite is strictly semantics-preserving.
  */
object IntersectSizeRewrite extends Rule[LogicalPlan] {

  private def stringArrayNoNulls(e: Expression): Boolean = e.dataType match {
    case ArrayType(StringType, false) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Size(ArrayIntersect(l, r), false)
          if stringArrayNoNulls(l) && stringArrayNoNulls(r) =>
        IntersectSize(l, r)
    }
}
