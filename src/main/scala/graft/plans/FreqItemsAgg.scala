package graft.plans

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters summary (Misra & Gries 1982; mergeable form
  * Agarwal et al., "Mergeable summaries", PODS 2012): at most `k`
  * (item, count) counters per group, any stream, any order.
  *
  * Guarantees (n = group's total item count, kept across merges):
  *  - every stored count ĉ(x) satisfies c(x) − n/(k+1) ≤ ĉ(x) ≤ c(x);
  *  - every item with true count c(x) > n/(k+1) IS in the summary —
  *    no true heavy hitter is ever evicted;
  *  - when the group has ≤ k distinct items the summary is EXACT (no
  *    decrement ever fires) — the oracle-checkable degenerate case,
  *    mirroring KMV's exact-below-k contract.
  *
  * This is the frequency face of the bounded-state sketch family
  * (MinKAgg bounds distinct-k-min; this bounds top-frequency): a group's
  * aggregation state through the shuffle is ≤ k counters regardless of
  * how many distinct items the group saw — contrast an exact
  * collect-and-count, whose state is distinct-cardinality-sized and
  * melts a reducer on a Zipf head. Mergeable: partial maps add
  * pointwise, then one (k+1)-th-largest subtraction restores the bound
  * (the PODS-2012 merge, error adds across merges but stays ≤ n/(k+1)).
  *
  * Output: array of (item, cnt) structs, count-descending then item-
  * ascending — deterministic for any partitioning when exact (≤ k
  * distinct); NULL for a group with no non-null input.
  */
case class FreqItemsAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[FreqBuffer] {

  require(k > 0, s"freq_items requires k > 0, got $k")

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("item", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "freq_items"

  override def createAggregationBuffer(): FreqBuffer = new FreqBuffer(k)

  override def update(buf: FreqBuffer, input: InternalRow): FreqBuffer = {
    val v = child.eval(input)
    if (v != null) buf.insert(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(buf: FreqBuffer, other: FreqBuffer): FreqBuffer = {
    buf.mergeIn(other)
    buf
  }

  override def eval(buf: FreqBuffer): Any = {
    if (buf.n == 0L) return null
    val entries = buf.counts.toArray.sortBy { case (item, c) => (-c, item) }
    new GenericArrayData(entries.map { case (item, c) =>
      new GenericInternalRow(
        Array[Any](UTF8String.fromString(item), c))
    })
  }

  override def serialize(buf: FreqBuffer): Array[Byte] = {
    val items = buf.counts.toArray
    val bytes = items.map { case (s, _) =>
      s.getBytes(StandardCharsets.UTF_8)
    }
    val size = 8 + 4 + bytes.map(12 + _.length).sum
    val bb = ByteBuffer.allocate(size)
    bb.putLong(buf.n)
    bb.putInt(items.length)
    var i = 0
    while (i < items.length) {
      bb.putInt(bytes(i).length)
      bb.put(bytes(i))
      bb.putLong(items(i)._2)
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): FreqBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new FreqBuffer(k)
    buf.n = bb.getLong
    val m = bb.getInt
    require(m >= 0 && m <= k,
      s"freq_items buffer claims $m counters (k=$k)")
    var i = 0
    while (i < m) {
      val len = bb.getInt
      require(len >= 0 && len <= bb.remaining - 8,
        s"freq_items buffer entry claims $len bytes, ${bb.remaining} left")
      val arr = new Array[Byte](len)
      bb.get(arr)
      buf.counts.update(new String(arr, StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): FreqItemsAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FreqItemsAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): FreqItemsAgg = copy(child = c.head)
}

/** ≤ k Misra-Gries counters plus the group's true item total `n`
  * (needed for the n/(k+1) error bound and kept exactly — longs add). */
final class FreqBuffer(val k: Int) {
  val counts: mutable.HashMap[String, Long] = mutable.HashMap.empty
  var n: Long = 0L

  def insert(item: String): Unit = {
    n += 1L
    counts.get(item) match {
      case Some(c) => counts.update(item, c + 1L)
      case None if counts.size < k => counts.update(item, 1L)
      case None =>
        // decrement-all: the classic MG step — one "vote" of every
        // stored item cancels against the unstored newcomer
        val dead = mutable.ArrayBuffer.empty[String]
        counts.mapValuesInPlace((_, c) => c - 1L)
        counts.foreach { case (key, c) => if (c <= 0L) dead += key }
        dead.foreach(counts.remove)
    }
  }

  def mergeIn(other: FreqBuffer): Unit = {
    n += other.n
    other.counts.foreach { case (item, c) =>
      counts.update(item, counts.getOrElse(item, 0L) + c)
    }
    if (counts.size > k) {
      // subtract the (k+1)-th largest count from everything — the
      // mergeable-summaries reduction back to k counters
      val sorted = counts.values.toArray
      java.util.Arrays.sort(sorted)
      val threshold = sorted(sorted.length - (k + 1))
      val dead = mutable.ArrayBuffer.empty[String]
      counts.mapValuesInPlace((_, c) => c - threshold)
      counts.foreach { case (key, c) => if (c <= 0L) dead += key }
      dead.foreach(counts.remove)
    }
  }
}
