package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, LongType}

/** Hilbert curve index (Hilbert 1891; the xy2d bit algorithm as in
  * Warren, Hacker's Delight §16-1 / Butz 1971): maps a point on the
  * 2^bits × 2^bits grid to its position along the space-filling curve.
  *
  * Versus the Morton/z-order key ([[InterleaveBits31]]): consecutive
  * Hilbert positions are always GRID NEIGHBOURS (|Δx|+|Δy| = 1 — the
  * property Round9Spec enumerates exhaustively), where the z-curve
  * jumps across the plane at every power-of-two boundary. For layout,
  * that means a Hilbert bucket is one connected rectangle-ish blob —
  * tighter per-bucket x/y bounding boxes, i.e. better file pruning on
  * range probes — at the price of a slightly costlier key (15 ops per
  * bit vs 2 for interleave).
  */
object HilbertKernel {

  /** Position of (x, y) along the 2^bits-order Hilbert curve;
    * x, y ∈ [0, 2^bits), result ∈ [0, 4^bits). */
  def xy2d(bits: Int, x0: Long, y0: Long): Long = {
    var x = x0
    var y = y0
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      // rotate the quadrant so the sub-curve orients correctly
      if (ry == 0) {
        if (rx == 1) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** Inverse: position d along the 2^bits-order curve → (x, y), packed
    * as (x << 32) | y. Used by the spec to pin bijectivity. */
  def d2xy(bits: Int, d0: Long): Long = {
    var x = 0L
    var y = 0L
    var t = d0
    var s = 1L
    while (s < (1L << bits)) {
      val rx = 1L & (t / 2)
      val ry = 1L & (t ^ rx)
      if (ry == 0) {
        if (rx == 1) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val tmp = x; x = y; y = tmp
      }
      x += s * rx
      y += s * ry
      t /= 4
      s <<= 1
    }
    (x << 32) | y
  }
}

/** long: Hilbert position of two long columns in [0, 2^bits) — the
  * curve order is a plan literal. */
case class HilbertIndex(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")

  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert_index"

  // analysis-time type error, not an execution-time ClassCastException
  // (the SortableBits convention — SQL `hilbert_index(3, 5)` with INT
  // literals must fail cleanly at analysis)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs two long arguments, got " +
          s"${left.dataType.catalogString} / ${right.dataType.catalogString}")

  override protected def nullSafeEval(x: Any, y: Any): Any =
    HilbertKernel.xy2d(bits, x.asInstanceOf[Long], y.asInstanceOf[Long])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.plans.HilbertKernel.xy2d($bits, $x, $y);")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): HilbertIndex = copy(left = l, right = r)
}
