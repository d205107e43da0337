package graft.plans

import java.nio.ByteBuffer
import java.util.Arrays

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** The k smallest DISTINCT long values of a group, as an ascending array —
  * the bounded-state primitive behind two sketch/index operators:
  *
  *  - KMV distinct-count sketch: over uniform hashes, the k-th minimum
  *    estimates cardinality as (k-1)/fraction-of-hash-space — a k-long
  *    buffer per group instead of the exact COUNT(DISTINCT) two-phase
  *    expansion (Bar-Yossef et al., "Counting distinct elements in a data
  *    stream", RANDOM 2002).
  *  - Capped posting lists: the k smallest doc ids of an inverted-index
  *    term. A hot term (Zipf head word appearing in every document) would
  *    pull its whole posting set through collect_list into one reducer;
  *    this keeps every partial buffer — and the bytes crossing the
  *    shuffle — bounded at k longs regardless of term frequency.
  *
  * Mergeable (union of two k-min sets is the k-min of the union), so
  * map-side partial aggregation applies. Distinctness is load-bearing for
  * KMV: a duplicate hash must not occupy a slot, or the k-th minimum is
  * biased low. NULL for a group with no non-null input (the
  * MIN-over-empty analogy — no sentinel that could collide downstream).
  */
case class MinKAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MinKBuffer] with IntegralLongInput {

  require(k > 0, s"min_k requires k > 0, got $k")

  // Integral-only, widened in update() — see IntegralLongInput for why
  // this is not ImplicitCastInputTypes(LongType) (silent double/string
  // coercion) and not bare Long unboxing (the r13 int32 eval crash).
  override protected def integralChild: Expression = child

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "min_k"

  override def createAggregationBuffer(): MinKBuffer = new MinKBuffer(k)

  override def update(buf: MinKBuffer, input: InternalRow): MinKBuffer = {
    val v = child.eval(input)
    if (v != null) buf.insert(longOf(v))
    buf
  }

  override def merge(buf: MinKBuffer, other: MinKBuffer): MinKBuffer = {
    var i = 0
    while (i < other.n) { buf.insert(other.vals(i)); i += 1 }
    buf
  }

  override def eval(buf: MinKBuffer): Any =
    if (buf.n == 0) null
    else new GenericArrayData(Arrays.copyOf(buf.vals, buf.n))

  override def serialize(buf: MinKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.n)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putLong(buf.vals(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MinKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    require(n >= 0 && n <= k && bytes.length == 4 + 8 * n,
      s"min_k buffer claims $n longs in ${bytes.length} bytes (k=$k)")
    val buf = new MinKBuffer(k)
    var i = 0
    while (i < n) { buf.vals(i) = bb.getLong; i += 1 }
    buf.n = n
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): MinKAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MinKAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): MinKAgg = copy(child = c.head)
}

/** Sorted-ascending bounded set of the k smallest distinct longs.
  * Insertion is binary search + arraycopy — k is small (tens to a few
  * hundred), so shifting beats a heap's constant factor and keeps the
  * buffer ready to serialize/eval without a final sort. */
final class MinKBuffer(val k: Int) {
  val vals: Array[Long] = new Array[Long](k)
  var n: Int = 0

  def insert(v: Long): Unit = {
    if (n == k && v >= vals(n - 1)) return
    val idx = Arrays.binarySearch(vals, 0, n, v)
    if (idx >= 0) return // distinct: already present
    val at = -idx - 1
    val last = if (n == k) k - 1 else n
    System.arraycopy(vals, at, vals, at + 1, last - at)
    vals(at) = v
    if (n < k) n += 1
  }
}
