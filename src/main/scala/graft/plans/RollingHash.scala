package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking via a Rabin-Karp rolling hash: the document is
  * split at positions where the rolling hash of the last `window` bytes
  * hits a boundary pattern (hash & mask == mask), and each chunk's
  * fingerprint is returned. Identical content produces identical chunk
  * boundaries REGARDLESS of surrounding edits — the property whole-doc
  * fingerprints lack, and the basis of sub-document dedup: two documents
  * sharing a paragraph share that chunk's fingerprint even when
  * everything around it moved.
  *
  * Map-side only (one pass over the bytes per doc); chunk fingerprints
  * flow into an exact-dedup hash aggregation downstream.
  */
object RollingHashKernel {

  private val Base = 257L

  /** FNV-1a over a byte range — the chunk fingerprint. */
  private def fnv(bytes: Array[Byte], from: Int, until: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = from
    while (i < until) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  def chunkHashes(bytes: Array[Byte], window: Int, maskBits: Int): Array[Long] = {
    if (bytes.isEmpty) return Array.emptyLongArray
    val mask = (1L << maskBits) - 1
    var basePow = 1L
    var j = 1
    while (j < window) { basePow *= Base; j += 1 }
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var chunkStart = 0
    var roll = 0L
    var i = 0
    while (i < bytes.length) {
      roll = roll * Base + (bytes(i) & 0xffL)
      if (i - chunkStart >= window) {
        roll -= (bytes(i - window) & 0xffL) * basePow * Base
      }
      if (i - chunkStart + 1 >= window && (roll & mask) == mask) {
        out += fnv(bytes, chunkStart, i + 1)
        chunkStart = i + 1
        roll = 0L
      }
      i += 1
    }
    if (chunkStart < bytes.length) out += fnv(bytes, chunkStart, bytes.length)
    out.toArray
  }

  /** FNV-1a fingerprints over FIXED chunk boundaries (every `chunkSize`
    * bytes; last chunk is the remainder). Shares the exact `fnv` kernel
    * with content-defined chunking — this is the cross-engine-checkable
    * face of that kernel: fixed boundaries are expressible in plain SQL
    * (a recursive FNV fold per chunk), so an external oracle can pin the
    * fingerprint function itself, while the rolling-hash BOUNDARIES stay
    * engine-specific. */
  def fnvFixedChunks(bytes: Array[Byte], chunkSize: Int): Array[Long] = {
    if (bytes.isEmpty) return Array.emptyLongArray
    val n = (bytes.length + chunkSize - 1) / chunkSize
    val out = new Array[Long](n)
    var c = 0
    while (c < n) {
      out(c) = fnv(bytes, c * chunkSize,
        math.min((c + 1) * chunkSize, bytes.length))
      c += 1
    }
    out
  }
}

case class ContentChunkHashes(child: Expression, window: Int, maskBits: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "content_chunk_hashes"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(RollingHashKernel.chunkHashes(
      input.asInstanceOf[UTF8String].getBytes, window, maskBits))

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.plans.RollingHashKernel.chunkHashes($c.getBytes(), $window, $maskBits));
       """.stripMargin)

  override protected def withNewChildInternal(c: Expression): ContentChunkHashes =
    copy(child = c)
}

/** FNV-1a chunk fingerprints at fixed `chunkSize`-byte boundaries over the
  * UTF-8 bytes of the input string — the oracle-checkable twin of
  * [[ContentChunkHashes]] (same fnv kernel, SQL-expressible boundaries). */
case class FixedChunkFnv(child: Expression, chunkSize: Int)
    extends UnaryExpression {
  require(chunkSize > 0, s"chunkSize must be positive, got $chunkSize")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "fixed_chunk_fnv"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(RollingHashKernel.fnvFixedChunks(
      input.asInstanceOf[UTF8String].getBytes, chunkSize))

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.plans.RollingHashKernel.fnvFixedChunks($c.getBytes(), $chunkSize));
       """.stripMargin)

  override protected def withNewChildInternal(c: Expression): FixedChunkFnv =
    copy(child = c)
}
