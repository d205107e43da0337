package graft.plans

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}

/** KLL-class mergeable quantile sketch over longs (Karnin, Lang &
  * Liberty, "Optimal quantile approximation in streams", FOCS 2016 —
  * the compactor-hierarchy structure; offsets here are DETERMINISTIC
  * per-level alternation in the Manku-Rajagopalan-Lindsay tradition
  * rather than random bits, so a given input multiset in a given
  * arrival order always yields the same sketch).
  *
  * Structure: level i holds items of weight 2^i; level capacities decay
  * geometrically (factor 2/3) from `k` at the top, so total state is
  * O(k) items regardless of n. When the total exceeds the capacity
  * budget, the lowest over-full level sorts and promotes every other
  * item (alternating offset, odd leftover stays), halving its footprint
  * while conserving total weight exactly: Σ item-weights = n always.
  *
  * Contracts, mirroring the FreqItemsAgg grading pattern:
  *  - EXACT while n ≤ k: no compaction ever fires, the sketch IS the
  *    sorted multiset with every weight 1, quantile queries are exact
  *    rank selection, and merge ≡ rebuild holds bit-for-bit — the
  *    oracle-checkable regime;
  *  - past k, rank queries are approximate with error that grows as
  *    O(n/k · log(n/k)) for this deterministic variant (property-tested
  *    with a generous constant in KllSpec; the randomized-offset
  *    original trades determinism for O(n/k)); mergeable in any order,
  *    weight conservation and value-domain containment hold always.
  *
  * Output (the EXTERNAL form): array<struct<v:long, w:long>> sorted by
  * (v, w) — the level structure is recoverable from w = 2^level, which
  * is what lets [[KllAgg]] with `fromSketches = true` fold externalized
  * sketches back together (the standing-artifact face: the streaming
  * quantile maintainer lands this array and merges batches into it).
  * NULL for a group with no non-null input.
  */
case class KllAgg(
    child: Expression,
    k: Int,
    fromSketches: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllBuffer] with IntegralLongInput {

  require(k >= 8, s"kll requires k >= 8, got $k")

  // Raw mode takes an integral column, widened in update() — see
  // IntegralLongInput for why this is not ImplicitCastInputTypes
  // (silent double/string coercion) and not bare Long unboxing (the
  // r13 int32 eval crash: a scaled-up corpus landed n_chars as int32
  // and both KLL queries failed only at that sf). Merge mode takes
  // exactly the externalized array<struct<v,w>> form eval() emits.
  override protected def integralChild: Expression = child
  override def checkInputDataTypes(): TypeCheckResult =
    if (!fromSketches) integralCheck()
    else child.dataType match {
      case ArrayType(StructType(Array(
          StructField("v", LongType, _, _),
          StructField("w", LongType, _, _))), _) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"kll_merge requires array<struct<v:bigint,w:bigint>> (the " +
          s"externalized kll_sketch form), got ${other.catalogString}")
    }

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("v", LongType, nullable = false),
      StructField("w", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String =
    if (fromSketches) "kll_merge" else "kll_sketch"

  override def createAggregationBuffer(): KllBuffer = new KllBuffer(k)

  override def update(buf: KllBuffer, input: InternalRow): KllBuffer = {
    val v = child.eval(input)
    if (v != null) {
      if (fromSketches) {
        val arr = v.asInstanceOf[ArrayData]
        var i = 0
        while (i < arr.numElements()) {
          val row = arr.getStruct(i, 2)
          buf.insertWeighted(row.getLong(0), row.getLong(1))
          i += 1
        }
      } else buf.insert(longOf(v))
    }
    buf
  }

  override def merge(buf: KllBuffer, other: KllBuffer): KllBuffer = {
    buf.mergeIn(other)
    buf
  }

  override def eval(buf: KllBuffer): Any = {
    if (buf.n == 0L) return null
    val out = mutable.ArrayBuffer.empty[(Long, Long)]
    var l = 0
    while (l < buf.levels.length) {
      val w = 1L << l
      buf.levels(l).foreach(v => out += ((v, w)))
      l += 1
    }
    val sorted = out.sortBy(identity).toArray
    new GenericArrayData(sorted.map { case (v, w) =>
      new GenericInternalRow(Array[Any](v, w))
    })
  }

  override def serialize(buf: KllBuffer): Array[Byte] = {
    val size = 8 + 4 + buf.levels.map(l => 5 + 8 * l.length).sum
    val bb = ByteBuffer.allocate(size)
    bb.putLong(buf.n)
    bb.putInt(buf.levels.length)
    var l = 0
    while (l < buf.levels.length) {
      bb.put(if (buf.flags(l)) 1.toByte else 0.toByte)
      bb.putInt(buf.levels(l).length)
      buf.levels(l).foreach(bb.putLong)
      l += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KllBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new KllBuffer(k)
    buf.n = bb.getLong
    val h = bb.getInt
    require(h >= 1 && h <= 64, s"kll buffer claims $h levels")
    var l = 0
    while (l < h) {
      if (l >= buf.levels.length) buf.addLevel()
      buf.flags(l) = bb.get() == 1.toByte
      val m = bb.getInt
      require(m >= 0 && m * 8 <= bb.remaining,
        s"kll buffer level $l claims $m items, ${bb.remaining} bytes left")
      var i = 0
      while (i < m) { buf.levels(l) += bb.getLong; i += 1 }
      l += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): KllAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): KllAgg = copy(child = c.head)
}

/** Compactor hierarchy: levels(i) holds items of weight 2^i; flags(i)
  * alternates the compaction offset at level i (the deterministic stand-
  * in for KLL's random bit). `n` is the group's true item-weight total,
  * conserved exactly through every compaction and merge. */
final class KllBuffer(val k: Int) {
  var n: Long = 0L
  val levels: mutable.ArrayBuffer[mutable.ArrayBuffer[Long]] =
    mutable.ArrayBuffer(mutable.ArrayBuffer.empty[Long])
  val flags: mutable.ArrayBuffer[Boolean] = mutable.ArrayBuffer(false)

  def addLevel(): Unit = {
    levels += mutable.ArrayBuffer.empty[Long]
    flags += false
  }

  /** Capacity of level l given the current height: k at the top, decay
    * 2/3 per level below, floor 2. */
  private def cap(l: Int): Int = {
    val h = levels.length
    math.max(2, math.ceil(k * math.pow(2.0 / 3.0, (h - 1 - l).toDouble))
      .toInt)
  }

  private def totalSize: Int = {
    var s = 0; var l = 0
    while (l < levels.length) { s += levels(l).length; l += 1 }
    s
  }

  private def totalCap: Int = {
    var s = 0; var l = 0
    while (l < levels.length) { s += cap(l); l += 1 }
    s
  }

  def insert(v: Long): Unit = {
    levels(0) += v
    n += 1L
    compress()
  }

  def insertWeighted(v: Long, w: Long): Unit = {
    require(w > 0 && (w & (w - 1)) == 0,
      s"kll external weights must be powers of two, got $w")
    val l = java.lang.Long.numberOfTrailingZeros(w)
    while (levels.length <= l) addLevel()
    levels(l) += v
    n += w
    compress()
  }

  def mergeIn(other: KllBuffer): Unit = {
    n += other.n
    var l = 0
    while (l < other.levels.length) {
      if (l >= levels.length) addLevel()
      levels(l) ++= other.levels(l)
      l += 1
    }
    compress()
  }

  /** While over budget: sort the lowest over-full level, promote every
    * other item (alternating offset) to the level above — each item's
    * weight doubles, total weight is conserved (odd leftover keeps the
    * largest at the source level). */
  private def compress(): Unit = {
    while (totalSize > totalCap) {
      var i = 0
      while (levels(i).length < cap(i)) i += 1
      val arr = levels(i).toArray
      java.util.Arrays.sort(arr)
      val pairs = arr.length / 2
      val off = if (flags(i)) 1 else 0
      flags(i) = !flags(i)
      if (i + 1 >= levels.length) addLevel()
      var j = 0
      while (j < pairs) { levels(i + 1) += arr(2 * j + off); j += 1 }
      levels(i).clear()
      if (arr.length % 2 == 1) levels(i) += arr(arr.length - 1)
    }
  }
}
