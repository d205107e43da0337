package graft.plans

import org.apache.spark.sql.catalyst.expressions.{ArrayIntersect, Size}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Expression-fusion optimizer rules for graft's kernels.
  *
  * SortedIntersectFusion: `size(array_intersect(a, b))` where both sides
  * are ShingleHashes outputs becomes the codegen'd SortedIntersectCount
  * merge scan. Sound because ShingleHashes arrays are ascending-sorted,
  * distinct, and null-free by construction — array_intersect's
  * build-a-hash-set-per-call result size equals the merge-scan count —
  * and both forms are null-on-null-input (the rewrite is skipped under
  * legacySizeOfNull, whose -1-on-null contract differs).
  *
  * Users composing the declarative formulation get the fused kernel
  * without rewriting their query; attach via GraftExtensions
  * (spark.sql.extensions) or GraftSession.attachOptimizations for an
  * existing session.
  */
object SortedIntersectFusion extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case s @ Size(ArrayIntersect(a: ShingleHashes, b: ShingleHashes), false)
          if a.n == b.n =>
        SortedIntersectCount(a, b)
    }
}
