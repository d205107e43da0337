package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType}

/** Integral-only input contract for the long-keyed sketch kernels
  * (BloomAgg/BloomContains, MinKAgg, KllAgg raw mode).
  *
  * Why not `ImplicitCastInputTypes` with `Seq(LongType)`: Spark's
  * implicit cast to long also accepts double/decimal (silent
  * truncation) and string (unparsable values become silently-skipped
  * nulls) — turning a loud type error into silently altered sketch
  * contents. These kernels mean "integral key, widened", nothing else,
  * so: analysis-time rejection of every non-integral child
  * ([[checkInputDataTypes]]), plus an eval-time widening accessor
  * ([[longOf]]) that replaces the analyzer-inserted Cast (these are
  * interpreted `TypedImperativeAggregate` update paths — a dispatch
  * resolved once per operator, not per row, costs what the Cast did).
  */
trait IntegralLongInput { self: Expression =>

  /** The child whose values feed the kernel as widened longs. */
  protected def integralChild: Expression

  protected def integralCheck(): TypeCheckResult =
    integralChild.dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an integral input (tinyint/smallint/" +
          s"int/bigint), got ${other.catalogString}")
    }

  override def checkInputDataTypes(): TypeCheckResult = integralCheck()

  /** Unboxes-and-widens a non-null value of `integralChild`'s declared
    * type to Long. Resolved once from the child's dataType. */
  @transient protected final lazy val longOf: Any => Long =
    IntegralLongInput.widener(integralChild.dataType, prettyName)
}

object IntegralLongInput {
  def widener(dt: DataType, name: String): Any => Long = dt match {
    case LongType    => v => v.asInstanceOf[Long]
    case IntegerType => v => v.asInstanceOf[Int].toLong
    case ShortType   => v => v.asInstanceOf[Short].toLong
    case ByteType    => v => v.asInstanceOf[Byte].toLong
    case other => throw new IllegalStateException(
      s"$name bound to non-integral input ${other.catalogString} — " +
        "checkInputDataTypes should have rejected this plan")
  }
}
