package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
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
case class ContentChunkHashes(child: Expression, window: Int, maskBits: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "content_chunk_hashes"

  private val mask: Long = (1L << maskBits) - 1
  private val Base = 257L
  // Base^(window-1) for removing the outgoing byte
  private val basePow: Long = {
    var p = 1L
    var i = 1
    while (i < window) { p *= Base; i += 1 }
    p
  }

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

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    if (bytes.isEmpty) return new GenericArrayData(Array.emptyLongArray)
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
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(c: Expression): ContentChunkHashes =
    copy(child = c)
}
