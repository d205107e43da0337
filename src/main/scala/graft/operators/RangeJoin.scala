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
    * `salt > 1` spreads each bin over `salt` shuffle keys: every point
    * hashes to ONE (bin, salt) bucket and every interval-bin replica is
    * exploded to ALL of them, so each true pair still meets exactly
    * once. Use it when the timeline is SHORT relative to the cluster —
    * a year of daily data at binDays=14 is only ~26 join keys, so an
    * un-salted shuffle join serializes into 26 tasks, and the broadcast
    * the planner picks instead of it must hold the whole exploded
    * interval set (unbounded at 100 TB, and r13's sf1 suite measured
    * the 32 MiB broadcast variant degrading 2-6× under cache-pressure
    * next to ~steady isolated runs). With salt ≈ cluster parallelism
    * the plan is a plain shuffle join on (bin, salt): interval
    * replication ×salt is the cost knob, pair-evaluation volume is
    * unchanged.
    *
    * @param points    point side; `pointCol` is a date/timestamp column
    * @param intervals interval side; [startCol, endCol] dates, end ≥ start
    * @param binDays   bin width in days (see tuning contract above)
    * @param salt      shuffle-key spread per bin (1 = plain bin join)
    */
  def pointInInterval(points: DataFrame, pointCol: String,
                      intervals: DataFrame, startCol: String,
                      endCol: String, binDays: Int,
                      salt: Int = 1): DataFrame = {
    require(binDays > 0, s"binDays must be positive, got $binDays")
    require(salt > 0, s"salt must be positive, got $salt")
    def binOf(c: Column): Column =
      floor(datediff(c.cast("date"), lit("1970-01-01")) /
        lit(binDays.toDouble)).cast("long")
    val keys = if (salt == 1) Seq("_bin") else Seq("_bin", "_salt")
    var p = points.withColumn("_bin", binOf(col(pointCol)))
    var iv = intervals
      .withColumn("_bin",
        explode(sequence(binOf(col(startCol)), binOf(col(endCol)))))
    if (salt > 1) {
      // hash the FULL point row, not pointCol: a date-grain point column
      // has few distinct values per bin, and hashing it alone would fold
      // whole days onto one salt bucket
      p = p.withColumn("_salt",
        pmod(xxhash64(points.columns.map(col).toIndexedSeq: _*),
          lit(salt)))
      iv = iv.withColumn("_salt",
        explode(sequence(lit(0L), lit(salt - 1L))))
    }
    p.join(iv, keys)
      .filter(col(pointCol).cast("date").between(
        col(startCol).cast("date"), col(endCol).cast("date")))
      .drop(keys: _*)
  }
}
