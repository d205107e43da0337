package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructType}

/** Sparse-vector dot product over key-sorted (key, weight) struct arrays
  * — the scoring workhorse of the champion-list RERANK stage: candidate
  * pairs join back to per-document weight vectors and score over ALL
  * shared terms with one O(|a|+|b|) merge scan per pair, no per-pair
  * hash map and no (pair × term) explode.
  *
  * The composable formulation (map_from_entries one side, aggregate +
  * element_at over the other) runs an interpreted lambda with an O(n)
  * MapData linear probe PER LOOKUP — O(n·m) per pair and no codegen.
  * This kernel is the same values (SortedDotSpec pins kernel ≡ HOF) in
  * one codegen'd merge scan.
  *
  * Contract: both arrays ascending by key with distinct keys (the shape
  * `array_sort(collect_list(struct(key, w)))` yields when keys are
  * unique within a document); weights are integer-quantized upstream so
  * the per-pair sum is exact in any engine and any order.
  */
object SortedDotKernel {

  /** Σ w_a·w_b over keys present in both arrays (merge scan). */
  def dot(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var s = 0L
    while (i < na && j < nb) {
      val ra = a.getStruct(i, 2)
      val rb = b.getStruct(j, 2)
      val ka = ra.getLong(0)
      val kb = rb.getLong(0)
      if (ka < kb) i += 1
      else if (ka > kb) j += 1
      else {
        s += ra.getLong(1) * rb.getLong(1)
        i += 1
        j += 1
      }
    }
    s
  }
}

/** long: merge-scan dot product of two ascending key-sorted
  * array&lt;struct&lt;k:long,w:long&gt;&gt; sparse vectors. */
case class SortedStructDot(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_struct_dot"

  private def isKwArray(t: DataType): Boolean = t match {
    case ArrayType(s: StructType, _) =>
      s.fields.length == 2 && s.fields.forall(_.dataType == LongType)
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isKwArray(left.dataType) && isKwArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs two array<struct<long,long>> arguments, got " +
          s"${left.dataType.catalogString} / ${right.dataType.catalogString}")

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedDotKernel.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.SortedDotKernel.dot($a, $b);")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): SortedStructDot =
    copy(left = l, right = r)
}
