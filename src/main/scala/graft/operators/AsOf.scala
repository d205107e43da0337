package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — an operator Spark's DataFrame API lacks.
  *
  * Implemented by composition (preference (a) of the custom-operator
  * ladder): tag both sides, union, and carry the latest right-side values
  * forward with last_value(ignoreNulls) over a (keys, time) window. One
  * sort-shuffle on (keys, time) total — no per-row range probe, no
  * broadcast of either side, no row explosion — the scalable formulation
  * for 100 TB (contrast a range-condition join, which Spark plans as
  * broadcast-nested-loop).
  *
  * Semantics: each left row is matched with the right row having the
  * greatest `rightTime` ≤ `leftTime` within the same keys (inclusive; at
  * equal timestamps the right row applies). Left rows with no prior right
  * row keep nulls — drop or default downstream.
  */
object AsOf {

  /** @param left        the probe side (events)
    * @param right       the state side (snapshots); its columns other than
    *                    keys/time are carried onto matching left rows
    * @param keys        equality keys
    * @param leftTime    event-time column on `left`
    * @param rightTime   snapshot-time column on `right`
    * @param valueCols   right-side columns to attach
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTime: String, rightTime: String,
               valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // snapshots sort BEFORE events at the same instant → inclusive match
    val taggedRight = right.select(
      (keys.map(col) :+ col(rightTime).as("__t") :+ lit(0).as("__tag")) ++
        valueCols.map(c => col(c).as(s"__v_$c")): _*)
    val taggedLeft = left.select(
      (keys.map(col) :+ col(leftTime).as("__t") :+ lit(1).as("__tag")) ++
        leftCols.filterNot(keys.contains).map(c => col(c).as(s"__l_$c")): _*)

    val unioned = taggedRight
      .select((taggedRight.columns.map(col) ++
        leftCols.filterNot(keys.contains)
          .map(c => lit(null).as(s"__l_$c"))): _*)
      .unionByName(taggedLeft.select(
        (taggedLeft.columns.map(col) ++
          valueCols.map(c => lit(null).as(s"__v_$c"))): _*))

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val filled = valueCols.foldLeft(unioned) { (df, c) =>
      df.withColumn(s"__v_$c",
        last(col(s"__v_$c"), ignoreNulls = true).over(w))
    }

    filled.filter(col("__tag") === 1)
      .select(
        (keys.map(col) :+ col("__t").as(leftTime)) ++
          leftCols.filterNot(c => keys.contains(c) || c == leftTime)
            .map(c => col(s"__l_$c").as(c)) ++
          valueCols.map(c => col(s"__v_$c").as(c)): _*)
  }
}
