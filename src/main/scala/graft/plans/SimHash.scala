package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass SimHash kernel (see SimHash64 below). Public object so
  * generated code can reach the static forwarder. */
object SimHashKernel {

  /** SimHash on the portable 60-bit md5 hash family — bit-identical to
    * the composable Dedup.simhash60Md5 (explode → md5Hash64 → 60 ±1
    * votes → sign) and to its DuckDB oracle, but one map-side pass. */
  def simhash60Md5(text: String): Long = {
    val tokens = text.trim.split("\\s+")
    val votes = new Array[Int](60)
    var i = 0
    while (i < tokens.length) {
      if (tokens(i).nonEmpty) {
        val h = ShingleHashKernel.md5Prefix60(
          tokens(i).getBytes(java.nio.charset.StandardCharsets.UTF_8))
        var b = 0
        while (b < 60) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 60) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  def simhash64(text: String): Long = {
    val tokens = text.trim.split("\\s+")
    val votes = new Array[Int](64)
    var i = 0
    while (i < tokens.length) {
      if (tokens(i).nonEmpty) {
        val h = XXH64.hashUTF8String(UTF8String.fromString(tokens(i)), 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }
}

/** 64-bit SimHash of a document in one pass — same semantics as the
  * composable Dedup.simhash64 (explode tokens → xxhash64(seed 42) → 64
  * per-bit ±1 votes → sign), but with NO shuffle: the explode+groupBy
  * formulation shuffles every token row; this computes the signature
  * map-side per document, which is the only formulation that stands at
  * 100 TB (tokens never leave the scan task). Codegen calls the kernel
  * statically, staying inside whole-stage codegen.
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(SimHashKernel.simhash64(
      input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.SimHashKernel.simhash64($c.toString());")

  override protected def withNewChildInternal(c: Expression): SimHash64 =
    copy(child = c)
}

/** Portable-md5-family SimHash (60-bit), one map-side pass — the fused
  * twin of Dedup.simhash60Md5's explode+groupBy plan. */
case class SimHash60Md5(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash60_md5"

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(SimHashKernel.simhash60Md5(
      input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.SimHashKernel.simhash60Md5($c.toString());")

  override protected def withNewChildInternal(c: Expression): SimHash60Md5 =
    copy(child = c)
}
