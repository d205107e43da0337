package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Add, And, ArrayAggregate,
  ArrayExists, ArrayIntersect, Divide, EqualTo, Expression, If, IsNull,
  LambdaFunction, Literal, Multiply, NamedLambdaVariable, Not, Size, Sqrt,
  ZipWith}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

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

/** HofCosineFusion: the higher-order-function cosine formulation
  *
  *   aggregate(zip_with(a, b, (x,y) -> x*y), 0d, (acc,x) -> acc+x)
  *     / (sqrt(aggregate(zip_with(a, a, ...))) *
  *        sqrt(aggregate(zip_with(b, b, ...))))
  *
  * becomes the fused codegen'd CosineSimilarity kernel — one
  * allocation-free loop instead of three ZipWith materializations + three
  * interpreted folds. Bit-identical: the kernel accumulates in the same
  * sequential left-to-right order as the fold.
  *
  * Exactness argument (both inputs must be array<double>):
  *  - equal lengths, no null elements: kernel ≡ fold, bit for bit;
  *  - unequal lengths: zip_with null-pads the shorter side, the null
  *    product poisons the fold → HOF yields NULL;
  *  - any null ELEMENT: same poisoning → HOF yields NULL;
  *  - null INPUT array: every step propagates → NULL.
  * So the rewrite is If(size(a) = size(b) [AND no-null-element guards],
  * kernel, NULL): Size with legacySizeOfNull=false sends null inputs to
  * the NULL branch, and the element guards are added only when the array
  * type admits null elements (containsNull=false inputs skip them) —
  * cheap allocation-free scans next to the three ZipWith materializations
  * they replace.
  */
object HofCosineFusion extends Rule[LogicalPlan] {

  /** Matches the analyzed tree of Similarity.dot(x, y) — the sequential
    * product-sum fold — and yields its two array inputs. */
  private def asDot(e: Expression): Option[(Expression, Expression)] = e match {
    case ArrayAggregate(
        ZipWith(a, b,
          LambdaFunction(Multiply(mx: NamedLambdaVariable,
            my: NamedLambdaVariable, _), Seq(ax, ay), _)),
        Literal(0.0, DoubleType),
        LambdaFunction(Add(macc: NamedLambdaVariable,
          mel: NamedLambdaVariable, _), Seq(aacc, ael), _),
        LambdaFunction(fin: NamedLambdaVariable, Seq(farg), _))
        if mx.exprId == ax.exprId && my.exprId == ay.exprId &&
          macc.exprId == aacc.exprId && mel.exprId == ael.exprId &&
          fin.exprId == farg.exprId =>
      Some((a, b))
    case _ => None
  }

  private def doubles(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  /** `NOT exists(arr, x -> isnull(x))` — only needed when the array type
    * admits null elements. */
  private def noNullElements(arr: Expression): Expression = {
    val x = NamedLambdaVariable("x", DoubleType, nullable = true)
    Not(ArrayExists(arr, LambdaFunction(IsNull(x), Seq(x))))
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case d @ Divide(num, Multiply(Sqrt(denA), Sqrt(denB), _), _) =>
        (asDot(num), asDot(denA), asDot(denB)) match {
          case (Some((a, b)), Some((a1, a2)), Some((b1, b2)))
              if a.semanticEquals(a1) && a.semanticEquals(a2) &&
                b.semanticEquals(b1) && b.semanticEquals(b2) &&
                doubles(a) && doubles(b) &&
                // the rewrite duplicates a/b into guards + kernel, which
                // is only sound if every evaluation sees the same value
                a.deterministic && b.deterministic =>
            val sameLen = EqualTo(Size(a, legacySizeOfNull = false),
              Size(b, legacySizeOfNull = false))
            val guards = Seq(a, b).collect {
              case e if e.dataType.asInstanceOf[ArrayType].containsNull =>
                noNullElements(e)
            }
            If(guards.foldLeft(sameLen: Expression)(And),
              CosineSimilarity(a, b), Literal(null, DoubleType))
          case _ => d
        }
    }
}
