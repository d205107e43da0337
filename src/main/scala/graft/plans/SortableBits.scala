package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Order-preserving double → unsigned-sortable long bijection — the key
  * transform under the radix-select exact-quantile operator
  * (Sketches.bisectQuantiles) and any sort-free selection over a
  * CONTINUOUS domain: unsigned order of the image equals IEEE-754 order
  * of the doubles (negatives before positives, -0.0 &lt; +0.0), so
  * selecting a rank reduces to walking fixed-width bit-prefix histogram
  * buckets — no global sort, no data shuffle.
  *
  * Mapping (the classic radix-sort float trick): for b =
  * doubleToLongBits(v), the image is ~b when b &lt; 0 (negative doubles
  * reverse into ascending order) and b ^ MIN_VALUE otherwise (positives
  * shift above all negatives). Exactly invertible; NaN is the caller's
  * to filter (it would sort above +Inf).
  */
object SortableBitsKernel {

  def toSortable(v: Double): Long = {
    val b = java.lang.Double.doubleToLongBits(v)
    if (b < 0) ~b else b ^ java.lang.Long.MIN_VALUE
  }

  def fromSortable(u: Long): Double = {
    val bits = if (u < 0) u ^ java.lang.Long.MIN_VALUE else ~u
    java.lang.Double.longBitsToDouble(bits)
  }
}

/** Bit-interleave kernel for Z-ORDER (Morton) clustering keys — the
  * multi-dimensional layout primitive behind OPTIMIZE ZORDER-style table
  * maintenance: rows sorted/bucketed by the interleaved key stay close
  * in EVERY dimension at once, so per-file min/max pruning stats stay
  * tight for predicates on either column (a single-dimension sort gives
  * tight bounds on one column and useless ones on the rest).
  */
object InterleaveBitsKernel {

  /** Interleave the low 31 bits of x (even positions) and y (odd
    * positions) into a 62-bit Morton code. 31 bits per dimension keeps
    * the code addition-representable in any signed-64 engine (the
    * DuckDB oracle restates it as a sum of shifted bit tests). */
  def interleave31(x: Long, y: Long): Long = {
    require(x >= 0 && x < (1L << 31) && y >= 0 && y < (1L << 31),
      s"interleave31 needs values in [0, 2^31), got ($x, $y)")
    var z = 0L
    var i = 0
    while (i < 31) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  /** Interleave the low 21 bits of three values into a 63-bit Morton
    * code (x at positions 0,3,6,…; y at 1,4,…; z at 2,5,…). 21 bits per
    * dimension keeps the code in a signed 64-bit non-negative range —
    * the 3-column clustering key. */
  def interleave3x21(x: Long, y: Long, z: Long): Long = {
    require(x >= 0 && x < (1L << 21) && y >= 0 && y < (1L << 21) &&
      z >= 0 && z < (1L << 21),
      s"interleave3x21 needs values in [0, 2^21), got ($x, $y, $z)")
    var m = 0L
    var i = 0
    while (i < 21) {
      m |= ((x >> i) & 1L) << (3 * i)
      m |= ((y >> i) & 1L) << (3 * i + 1)
      m |= ((z >> i) & 1L) << (3 * i + 2)
      i += 1
    }
    m
  }
}

/** long: 63-bit Morton interleave of THREE longs in [0, 2^21) — the
  * 3-dimension clustering key (x bits at positions 0,3,6,…; y at
  * 1,4,7,…; z at 2,5,8,…). */
case class InterleaveBits3x21(first: Expression, second: Expression,
                              third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "interleave_bits3x21"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (children.forall(_.dataType == LongType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs three long arguments, got " +
          children.map(_.dataType.catalogString).mkString(" / "))

  override def nullSafeEval(a: Any, b: Any, c: Any): Any =
    InterleaveBitsKernel.interleave3x21(a.asInstanceOf[Long],
      b.asInstanceOf[Long], c.asInstanceOf[Long])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    nullSafeCodeGen(ctx, ev, (a, b, c) =>
      s"${ev.value} = " +
        s"graft.plans.InterleaveBitsKernel.interleave3x21($a, $b, $c);")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): InterleaveBits3x21 =
    copy(first = f, second = s, third = t)
}

/** long: 62-bit Morton interleave of two longs in [0, 2^31). */
case class InterleaveBits31(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "interleave_bits31"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs two long arguments, got " +
          s"${left.dataType.catalogString} / ${right.dataType.catalogString}")

  override def nullSafeEval(a: Any, b: Any): Any =
    InterleaveBitsKernel.interleave31(
      a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.InterleaveBitsKernel.interleave31($a, $b);")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): InterleaveBits31 =
    copy(left = l, right = r)
}

/** long: unsigned-sortable image of a double (order-preserving
  * bijection). */
case class DoubleSortableBits(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "double_sortable_bits"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs a double argument, got " +
          child.dataType.catalogString)

  override def nullSafeEval(input: Any): Any =
    SortableBitsKernel.toSortable(input.asInstanceOf[Double])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.SortableBitsKernel.toSortable($c);")

  override protected def withNewChildInternal(c: Expression)
      : DoubleSortableBits = copy(child = c)
}
