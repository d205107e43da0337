package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Compiled Aho-Corasick multi-pattern automaton (Aho & Corasick, CACM
  * 1975): goto trie + BFS failure links + fail-propagated output sets.
  * One pass over the text finds every occurrence of every pattern —
  * the gazetteer-tagging primitive that replaces N substring scans
  * (or N regexp kernels) with one, the difference between O(len) and
  * O(N·len) per document on a large keyword list.
  *
  * The automaton is built ONCE per plan (the expression embeds it as a
  * codegen reference object); matching allocates only the hit bitmap.
  * Matching is case-sensitive over raw chars — callers lowercase text
  * and patterns together when they want case-folding.
  */
final class AcAutomaton(val patterns: Array[String]) extends Serializable {
  require(patterns.nonEmpty, "empty pattern list")
  require(patterns.forall(_.nonEmpty), "empty pattern")
  require(patterns.distinct.length == patterns.length,
    "duplicate patterns")

  // trie as parallel arrays; transitions in per-node hash maps (pattern
  // alphabets are tiny relative to UTF-16, dense tables would waste)
  private val children =
    scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.Map.empty[Char, Int])
  private val out = scala.collection.mutable.ArrayBuffer(
    List.empty[Int])
  private val fail = scala.collection.mutable.ArrayBuffer(0)

  patterns.zipWithIndex.foreach { case (p, pi) =>
    var node = 0
    p.foreach { c =>
      node = children(node).getOrElseUpdate(c, {
        children += scala.collection.mutable.Map.empty[Char, Int]
        out += Nil
        fail += 0
        children.length - 1
      })
    }
    out(node) = pi :: out(node)
  }
  // BFS failure links; outputs propagate along fail so every node
  // knows the full set of patterns ending at it
  locally {
    val queue = scala.collection.mutable.Queue.empty[Int]
    children(0).values.foreach(queue.enqueue(_))
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      children(u).foreach { case (c, v) =>
        var f = fail(u)
        while (f != 0 && !children(f).contains(c)) f = fail(f)
        fail(v) = if (children(f).contains(c) && children(f)(c) != v)
          children(f)(c) else 0
        out(v) = out(v) ::: out(fail(v))
        queue.enqueue(v)
      }
    }
  }
  private val childArr: Array[Map[Char, Int]] =
    children.map(_.toMap).toArray
  private val failArr: Array[Int] = fail.toArray
  private val outArr: Array[Array[Int]] = out.map(_.toArray).toArray
  // patterns in ascending order with a precomputed permutation, so the
  // returned tag array is deterministic regardless of insert order
  private val sortedIdx: Array[Int] =
    patterns.zipWithIndex.sortBy(_._1).map(_._2)

  /** Distinct patterns occurring in `text`, ascending. */
  def matches(text: String): Array[UTF8String] = {
    val hit = new Array[Boolean](patterns.length)
    var node = 0
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      while (node != 0 && !childArr(node).contains(c)) node = failArr(node)
      node = childArr(node).getOrElse(c, 0)
      val o = outArr(node)
      var j = 0
      while (j < o.length) { hit(o(j)) = true; j += 1 }
      i += 1
    }
    sortedIdx.filter(hit(_)).map(i0 => UTF8String.fromString(patterns(i0)))
  }
}

/** array<string>: the distinct gazetteer patterns occurring in the input
  * string, ascending — one automaton pass, codegen embeds the compiled
  * automaton as a reference object. */
case class MultiPatternMatches(child: Expression, patterns: Seq[String])
    extends UnaryExpression {

  @transient private lazy val automaton =
    new AcAutomaton(patterns.toArray)

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String = "multi_pattern_matches"

  // analysis-time type error, not an execution-time ClassCastException
  // (the SortableBits convention)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs a string argument, got " +
          child.dataType.catalogString)

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(automaton
      .matches(input.asInstanceOf[UTF8String].toString)
      .asInstanceOf[Array[Any]])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) = {
    val ac = ctx.addReferenceObj("acAutomaton", automaton,
      classOf[AcAutomaton].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  (Object[]) $ac.matches($c.toString()));
       """.stripMargin)
  }

  override protected def withNewChildInternal(c: Expression)
      : MultiPatternMatches = copy(child = c)
}
