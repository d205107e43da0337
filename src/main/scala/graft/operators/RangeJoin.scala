package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Date-range (point-in-interval) join — the second temporal-join shape
  * Spark's planner lacks (AsOf covers "latest state at time t"; this one
  * covers "every interval covering time t").
  *
  * A raw range predicate (`p.ts BETWEEN i.start AND i.end`) has no equality
  * key, so Spark plans it as a broadcast-nested-loop join — O(|points| ×
  * |intervals|) comparisons, a non-starter at cluster scale. The standard
  * fix is BINNING: quantize the timeline into fixed-width bins, replicate
  * every interval to each bin it covers (`sequence` + `explode`, map-side),
  * and equi-join on the bin before re-checking the exact range predicate.
  * Each point lives in EXACTLY one bin, so every true (point, interval)
  * pair meets exactly once — no post-join dedup, results are exactly the
  * nested-loop join's.
  *
  * Tuning contract: replication factor is ~(avg interval length /
  * `binDays`) + 1, join fan-in per bin is (points per bin) × (intervals
  * overlapping the bin) — pick `binDays` near the typical interval length
  * so both stay O(1)-ish; skewy hot bins split further with the usual
  * salting levers. The shuffle is ONE equi-join on the bin key.
  */
object RangeJoin {

  /** Inner-join `points` to every `intervals` row whose CLOSED interval
    * [startCol, endCol] contains the point (date grain).
    *
    * @param points    point side; `pointCol` is a date/timestamp column
    * @param intervals interval side; [startCol, endCol] dates, end ≥ start
    * @param binDays   bin width in days (see tuning contract above)
    */
  def pointInInterval(points: DataFrame, pointCol: String,
                      intervals: DataFrame, startCol: String,
                      endCol: String, binDays: Int): DataFrame = {
    require(binDays > 0, s"binDays must be positive, got $binDays")
    def binOf(c: Column): Column =
      floor(datediff(c.cast("date"), lit("1970-01-01")) /
        lit(binDays.toDouble)).cast("long")
    val p = points.withColumn("_bin", binOf(col(pointCol)))
    val iv = intervals
      .withColumn("_bin",
        explode(sequence(binOf(col(startCol)), binOf(col(endCol)))))
    p.join(iv, Seq("_bin"))
      .filter(col(pointCol).cast("date").between(
        col(startCol).cast("date"), col(endCol).cast("date")))
      .drop("_bin")
  }
}
