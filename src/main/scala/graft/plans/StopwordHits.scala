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

/** One-pass character-class census. The composable formulation costs one
  * regexp_replace pass per class (strip-and-diff); this counts every class
  * in a single code-point scan with semantics identical to the Java-regex
  * classes it replaces: [A-Za-z], [0-9], and \s = [ \t\n\x0B\f\r].
  * length slot counts code points, matching Spark's length(). */
object CharClassKernel {
  /** [n_chars, alpha, digit, whitespace] of `text`. */
  def counts(text: UTF8String): Array[Int] = {
    val s = text.toString
    var i = 0
    var len = 0
    var alpha = 0
    var digit = 0
    var ws = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      len += 1
      if ((cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z')) alpha += 1
      else if (cp >= '0' && cp <= '9') digit += 1
      else if (cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0b ||
        cp == '\f' || cp == '\r') ws += 1
      i += Character.charCount(cp)
    }
    Array(len, alpha, digit, ws)
  }

  def countsArray(text: UTF8String): GenericArrayData =
    new GenericArrayData(counts(text))
}

/** array<int>: [n_chars, alpha_chars, digit_chars, ws_chars] in one pass —
  * quality scoring reads slots of a single shared subexpression. */
case class CharClassCounts(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "char_class_counts"

  override def nullSafeEval(input: Any): Any =
    CharClassKernel.countsArray(input.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.CharClassKernel.countsArray($c);")

  override protected def withNewChildInternal(c: Expression): CharClassCounts =
    copy(child = c)
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
