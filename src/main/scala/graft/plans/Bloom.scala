package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, LongType}

/** Shared Bloom hashing: hash j of key v is the splitmix64 finalizer over
  * (v + j·golden), reduced mod numBits — one multiplicative stream per
  * probe, identical on the build (BloomAgg) and probe (BloomContains)
  * sides, which is the whole correctness contract of the filter. */
object BloomOps {
  final val Golden = -7046029254386353131L // 0x9E3779B97F4A7C15

  def mix(v: Long): Long = {
    var z = v
    z = (z ^ (z >>> 30)) * -4658895280553007687L // 0xBF58476D1CE4E5B9
    z = (z ^ (z >>> 27)) * -7723592293110705685L // 0x94D049BB133111EB
    z ^ (z >>> 31)
  }

  def bitIndex(v: Long, j: Int, numBits: Int): Int =
    java.lang.Math.floorMod(mix(v + j * Golden), numBits.toLong).toInt

  def set(bits: Array[Long], v: Long, numHashes: Int, numBits: Int): Unit = {
    var j = 0
    while (j < numHashes) {
      val idx = bitIndex(v, j, numBits)
      bits(idx >>> 6) |= (1L << (idx & 63))
      j += 1
    }
  }

  def contains(bits: ArrayData, v: Long, numHashes: Int,
               numBits: Int): Boolean = {
    var j = 0
    while (j < numHashes) {
      val idx = bitIndex(v, j, numBits)
      if ((bits.getLong(idx >>> 6) & (1L << (idx & 63))) == 0L) return false
      j += 1
    }
    true
  }
}

/** Bloom-filter build over a group's long keys: `numBits` bits as an
  * array<bigint> bitset, `numHashes` probes per key — the semi-join
  * REDUCTION artifact. A distinct key set too large to broadcast as a
  * hash relation (8+ bytes a key plus overhead) often still broadcasts
  * as a Bloom filter at ~10 bits a key with a 1% false-positive rate;
  * the probe side then drops non-matching rows MAP-SIDE before the
  * shuffle, and the exact join that follows sees only survivors (false
  * positives are culled there, so the composed result is exactly the
  * plain join's — the filter is transparent, which is what lets the
  * q114 oracle be the plain join).
  *
  * Mergeable (bitwise OR), so map-side partial aggregation applies;
  * buffer size is fixed at numBits/64 longs regardless of input.
  */
case class BloomAgg(
    child: Expression,
    numBits: Int,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with IntegralLongInput {

  require(numBits > 0 && numBits % 64 == 0,
    s"numBits must be a positive multiple of 64, got $numBits")
  require(numHashes > 0, s"numHashes must be positive, got $numHashes")

  // Integral-only, widened in update() — see IntegralLongInput for why
  // this is not ImplicitCastInputTypes(LongType) (silent double/string
  // coercion) and not bare Long unboxing (the r13 int32 eval crash).
  override protected def integralChild: Expression = child

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bloom_agg"

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](numBits / 64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) BloomOps.set(buf, longOf(v), numHashes, numBits)
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) |= other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    require(bytes.length == numBits / 8,
      s"bloom buffer is ${bytes.length} bytes, expected ${numBits / 8}")
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(numBits / 64)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(o: Int): BloomAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): BloomAgg = copy(child = c.head)
}

/** Probe side of the Bloom reduction: true iff every probe bit of `key`
  * is set in `bits` (definitely-absent keys return false; present keys
  * always true; false positives at the configured rate). Codegen'd —
  * this sits in the map-side filter ahead of a shuffle, the hot path
  * the reduction exists to thin. */
case class BloomContains(left: Expression, right: Expression,
                         numHashes: Int, numBits: Int)
  extends BinaryExpression with IntegralLongInput {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_contains"

  // Probe key is integral-only like the build side (the r14 advice
  // finding: a bare Long unbox here made int32 probes execution-mode-
  // dependent — Java's int→long coercion saved codegen but interpreted
  // eval crashed). The filter side must be array<bigint> as emitted by
  // BloomAgg.
  override protected def integralChild: Expression = right
  override def checkInputDataTypes(): TypeCheckResult =
    left.dataType match {
      case ArrayType(LongType, _) => integralCheck()
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an array<bigint> filter (BloomAgg's " +
          s"output), got ${other.catalogString}")
    }

  override def nullSafeEval(bits: Any, v: Any): Any =
    BloomOps.contains(bits.asInstanceOf[ArrayData],
      longOf(v), numHashes, numBits)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    nullSafeCodeGen(ctx, ev, (b, v) =>
      s"${ev.value} = graft.plans.BloomOps.contains(" +
        s"$b, $v, $numHashes, $numBits);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomContains =
    copy(left = newLeft, right = newRight)
}
