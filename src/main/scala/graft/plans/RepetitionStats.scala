package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass repetition census kernel. */
object RepetitionKernel {
  /** [n_words, n_distinct_words, top_word_count, top_bigram_count] of the
    * whitespace tokenization — exact string counting (real hash maps, no
    * hash-only buckets), so values match the sort+run-length and the
    * unnest+GROUP BY formulations token for token. Blank text → zeros. */
  def stats(text: String): Array[Long] = {
    val t = text.trim
    if (t.isEmpty) return Array(0L, 0L, 0L, 0L)
    val words = t.split("\\s+")
    val wc = new java.util.HashMap[String, Integer]()
    var top = 0
    var i = 0
    while (i < words.length) {
      val c = wc.merge(words(i), 1, (a, b) => a + b)
      if (c > top) top = c
      i += 1
    }
    var topBg = 0L
    if (words.length >= 2) {
      val bc = new java.util.HashMap[String, Integer]()
      i = 0
      while (i < words.length - 1) {
        val c = bc.merge(words(i) + " " + words(i + 1), 1, (a, b) => a + b)
        if (c > topBg) topBg = c.toLong
        i += 1
      }
    }
    Array(words.length.toLong, wc.size.toLong, top.toLong, topBg)
  }
}

/** array<long> [n_words, n_distinct, top_word_count, top_bigram_count]:
  * the native one-pass twin of the sort+run-length repetition formulation
  * (TextAnalysis.maxSortedRunLength) — same values, no per-row sorts, no
  * interpreted lambda folds; codegen emits a static kernel call so the
  * expression stays inside whole-stage codegen. Map-side only: tokens
  * never leave the row. */
case class RepetitionStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "repetition_stats"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(RepetitionKernel.stats(
      input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.plans.RepetitionKernel.stats($c.toString()));
       """.stripMargin)

  override protected def withNewChildInternal(c: Expression): RepetitionStats =
    copy(child = c)
}
