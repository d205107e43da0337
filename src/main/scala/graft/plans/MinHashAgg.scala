package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Group-level MinHash signature: aggregates per-row base-hash arrays
  * (ShingleHashes output) into ONE k-element signature for the whole group
  * — the signature of the UNION of the groups' shingle sets, since min is
  * insensitive to duplicates across rows. The group-dedup primitive:
  * cluster-level signatures, mergeable across partitions (elementwise min),
  * so partial aggregation applies and only k longs per group cross the
  * shuffle.
  *
  * Same portable hash family as ShingleMinHash (md5-prefix base hash,
  * xor with seed·2654435769), so the result is reproducible in any engine
  * with md5 — and DuckDB-oracle-checkable as
  * MIN(xor(hash, seed*2654435769)) GROUP BY key, seed.
  */
case class MinHashAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = child :: Nil
  // NULL for a group that never folded a hash (all-null inputs or only
  // empty arrays) — the MIN-over-unnested-hashes analogy yields NULL/no
  // row there, and a Long.MaxValue sentinel signature would band-collide
  // with every other empty group's.
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_agg"

  // buffer slot k is the fold flag: 1 once any hash element was folded
  override def createAggregationBuffer(): Array[Long] = {
    val buf = Array.fill(k + 1)(Long.MaxValue)
    buf(k) = 0L
    buf
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val hashes = v.asInstanceOf[ArrayData]
      val n = hashes.numElements()
      if (n > 0) buf(k) = 1L
      var j = 0
      while (j < k) {
        val mix = j.toLong * 2654435769L
        var m = buf(j)
        var i = 0
        while (i < n) {
          val h = hashes.getLong(i) ^ mix
          if (h < m) m = h
          i += 1
        }
        buf(j) = m
        j += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var j = 0
    while (j < k) {
      if (other(j) < buf(j)) buf(j) = other(j)
      j += 1
    }
    if (other(k) == 1L) buf(k) = 1L
    buf
  }

  override def eval(buf: Array[Long]): Any =
    if (buf(k) == 0L) null else new GenericArrayData(buf.take(k))

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * (k + 1))
    buf.foreach(bb.putLong)
    bb.array()
  }

  /** Wire format is exactly k+1 longs (signature + fold flag). No legacy
    * path: the pre-flag format serialized never-folded buffers as k
    * Long.MaxValue values too, so a k-long payload is ambiguous — guessing
    * folded=1 would turn legacy empty-group state into an all-MaxValue
    * signature (the exact band-collision bug the flag fixed). Spilled
    * state never crosses library versions here, so fail fast instead. */
  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bytes.length / 8
    require(n == k + 1,
      s"minhash_agg buffer has $n longs, expected ${k + 1}")
    val buf = new Array[Long](k + 1)
    var i = 0
    while (i < n) { buf(i) = bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): MinHashAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MinHashAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): MinHashAgg = copy(child = c.head)
}
