package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused stopword-hit counting. The composable formulation
  * (TextAnalysis.wordHits: pad → lower → regexp_replace-diff per word)
  * costs one regex pass over the document per stopword — 20 passes per doc
  * for the 4-language classifier. This kernel lowercases once (UTF8String
  * .toLowerCase — the same mapping Spark's lower() applies, so counts are
  * bit-equal to the proven oracle-checked path) and counts non-overlapping
  * ` word ` occurrences with plain indexOf scans, exactly matching the
  * replace-diff semantics (left-to-right, consumed matches don't overlap).
  */
object StopwordKernel {

  /** Per-profile hit totals over the padded lowercase text. */
  def profileHits(text: UTF8String, needles: Array[Array[String]]): Array[Int] = {
    val s = " " + text.toLowerCase.toString + " "
    val out = new Array[Int](needles.length)
    var p = 0
    while (p < needles.length) {
      val ns = needles(p)
      var tot = 0
      var k = 0
      while (k < ns.length) {
        val nd = ns(k)
        var i = s.indexOf(nd)
        while (i >= 0) { tot += 1; i = s.indexOf(nd, i + nd.length) }
        k += 1
      }
      out(p) = tot
      p += 1
    }
    out
  }

  def profileHitsArray(text: UTF8String,
                       needles: Array[Array[String]]): GenericArrayData =
    new GenericArrayData(profileHits(text, needles))
}

/** array<int>: per-profile stopword-hit counts of `child` — one expression
  * evaluation per row regardless of profile count, so the classifier's
  * hit columns and the argmax all read slots of a single shared
  * subexpression. */
case class StopwordProfileHits(child: Expression, profiles: Seq[Seq[String]])
    extends UnaryExpression {

  @transient private lazy val needles: Array[Array[String]] =
    profiles.map(_.map(w => s" $w ").toArray).toArray

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "stopword_profile_hits"

  override def nullSafeEval(input: Any): Any =
    StopwordKernel.profileHitsArray(input.asInstanceOf[UTF8String], needles)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) = {
    val ref = ctx.addReferenceObj("needles", needles, "java.lang.String[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.StopwordKernel.profileHitsArray($c, $ref);")
  }

  override protected def withNewChildInternal(c: Expression): StopwordProfileHits =
    copy(child = c)
}
