package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, Expression, GenericInternalRow, JoinedRow,
  RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics

/** Physical as-of (point-in-time) join — the whole-operator Catalyst path
  * (custom LogicalPlan + Strategy + SparkPlan) for what AsOf.asofJoin
  * expresses by union+window composition.
  *
  * Semantics (identical to the composition): each left row picks up the
  * right row with the greatest rightTime <= leftTime within equal keys
  * (inclusive); left rows with no prior right row get nulls. Key equality
  * is SQL equality: a NULL in any key column never matches (null-key left
  * rows emit with null values, null-key right rows are ignored) — the
  * same contract as DuckDB ASOF LEFT JOIN.
  *
  * Why a dedicated operator: the composition unions both inputs before the
  * window, so every left column rides through the sort as null-padded
  * baggage and the window sorts |L|+|R| rows of the full combined width.
  * This exec sorts each side independently at its own width and streams a
  * single forward merge per partition — no union, no row explosion, no
  * second pass. Each side shuffles once on the keys (the same exchange a
  * sort-merge join would need), which is the 100 TB-scalable shape: no
  * broadcast, no range probe, memory O(1) per partition beyond the sorts.
  */
case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    rightValues: Seq[Attribute])
  extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ rightValues.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** Plans AsOfJoin into AsOfJoinExec; attach via
  * spark.experimental.extraStrategies (AsOf.asofJoinExec does this
  * idempotently) or through GraftExtensions. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt, rv) =>
      AsOfJoinExec(lk, rk, lt, rt, rv, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    rightValues: Seq[Attribute],
    left: SparkPlan,
    right: SparkPlan)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ rightValues.map(_.withNullability(true))

  // Both sides cluster on the equality keys — the same co-partitioning
  // contract as a sort-merge join, so EnsureRequirements aligns partition
  // counts and zipPartitions pairs co-located key ranges.
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  // Each side sorted by (keys, time): the merge is a single forward scan.
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTime, Ascending))

  // Streaming merge preserves the left side's partitioning and order.
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "output rows"))

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val keyTypes = leftKeys.map(_.dataType)
    val timeType = leftTime.dataType
    val lOutput = left.output
    val rOutput = right.output
    val lKeys = leftKeys
    val rKeys = rightKeys
    val lTime = leftTime
    val rTime = rightTime
    val rVals: Seq[Expression] = rightValues
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeys, lOutput)
      val rKeyProj = UnsafeProjection.create(rKeys, rOutput)
      val lTimeProj = UnsafeProjection.create(Seq(lTime), lOutput)
      val rTimeProj = UnsafeProjection.create(Seq(rTime), rOutput)
      val rValProj = UnsafeProjection.create(rVals, rOutput)
      // bind against the NULLABLE output attrs (not the right child's
      // attrs): unmatched left rows feed nulls into the value slots, and a
      // non-nullable binding would read them as zeros
      val outProj = UnsafeProjection.create(outAttrs, outAttrs)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(timeType))
      val nullVals = new GenericInternalRow(rVals.length)
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        // lookahead right row, not yet merged (copies: iterator rows are
        // reused buffers)
        private var pKey: InternalRow = _
        private var pTime: InternalRow = _
        private var pVals: InternalRow = _
        // latest right row whose (key, time) is <= the current left row
        private var mKey: InternalRow = _
        private var mVals: InternalRow = _

        private def loadPending(): Boolean = {
          if (pKey == null && rIter.hasNext) {
            val r = rIter.next()
            pKey = rKeyProj(r).copy()
            pTime = rTimeProj(r).copy()
            pVals = rValProj(r).copy()
          }
          pKey != null
        }

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lKey = lKeyProj(l)
          val lTimeRow = lTimeProj(l)
          var continue = true
          while (continue && loadPending()) {
            if (pKey.anyNull) {
              // SQL equality: a null key never matches anything — discard
              // (natural ordering would otherwise equate null with null)
              pKey = null
            } else {
              val c = keyOrd.compare(pKey, lKey)
              if (c < 0) {
                // right group already behind every remaining left row
                pKey = null
              } else if (c == 0 && timeOrd.compare(pTime, lTimeRow) <= 0) {
                mKey = pKey
                mVals = pVals
                pKey = null
              } else {
                continue = false
              }
            }
          }
          val matched = !lKey.anyNull && mKey != null &&
            keyOrd.compare(mKey, lKey) == 0
          numOutputRows += 1
          outProj(joined(l, if (matched) mVals else nullVals))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
