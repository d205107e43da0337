package graft.plans

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-scaled shuffle width for the handful of operators whose
  * per-partition working set is CANDIDATE-PAIR-sized, not input-sized.
  *
  * The session default (`spark.sql.shuffle.partitions`) sizes shuffles
  * for input-linear queries; a block self-join's in-flight volume grows
  * with Σ_block c·(c−1)/2 — quadratic in block occupancy — so a width
  * that was comfortable at sf0.1 spills at sf10 (the r16 full-suite
  * sweep measured q37 spilling 11.26 GB and q265 7.96 GB at the fixed
  * 128-partition scale-tier width; every other query spilled 0). On a
  * real cluster `spark.sql.files.maxPartitionBytes` + AQE coalescing do
  * this sizing for scans, but nothing re-derives the width of an
  * intermediate pair explosion — the operator has to, from the same
  * block census it already knows how to compute.
  *
  * Both entry points are BOUNDED decisions (the Skew.autoJoin rule): one
  * column-pruned diagnostic aggregation collapsed to a single row at
  * plan-build time, never a per-row data path. The width floors at the
  * session setting — at the oracle-checked sfs every query keeps its
  * committed plan and timing — and caps at 4096 (at 32 MB targets
  * that's a 128 GB in-flight working set, far past any tested tier; a
  * genuinely bigger job should raise `targetBytes`, not the cap).
  */
object ShuffleWidth {

  /** Width for a block self-join: the diagnostic census counts rows per
    * `keys` block and sizes the shuffle so that candidate pairs
    * (Σ c·(c−1)/2 × `bytesPerPair`) plus the carried row payload
    * (Σ `rowBytes`, e.g. shingle arrays riding the join) land at
    * ~`targetBytes` per partition.
    *
    * `keyed` must be a cheap projection (metadata columns only) of the
    * SAME rows the self-join blocks on — never the expensive derived
    * frame itself, or the diagnostic would pay the kernel twice. */
  def pairWidth(spark: SparkSession, keyed: DataFrame, keys: Seq[String],
                bytesPerPair: Long, rowBytes: Column = lit(0L),
                targetBytes: Long = 32L << 20): Int = {
    // The census itself runs in DOUBLE: a long `sum(c*(c-1) div 2)` can
    // wrap negative INSIDE Spark before any driver-side guard sees it
    // (non-ANSI sum wraps silently), and the old `mulSat(...) + rb` then
    // added the row term unsaturated — both paths could hand widthFor a
    // negative total that silently floored at the session width, the
    // exact under-width failure this module exists to prevent. Doubles
    // are exact for every pair count below 2^53 (far past the 4096-cap
    // regime) and only lose precision where the width is saturated
    // anyway; satLong clamps the final estimate. Margin, recorded
    // (r18 advice): the width pins at its 4096 cap from
    // 4096×32 MB/24 B ≈ 5.7e9 pairs, while double stays exact to
    // 2^53 ≈ 9.0e15 — precision loss begins ~1.6e6× past the point
    // where the answer is already the cap (Round19Spec pins the
    // arithmetic; re-audit only if a tier's census ever nears 2^53,
    // i.e. ~10^7× today's sf10 worst case of ~1e9 pairs).
    val row = keyed
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("c"), sum(rowBytes.cast("double")).as("rb"))
      .agg(
        coalesce(sum(expr(
          "CAST(c AS DOUBLE) * (CAST(c AS DOUBLE) - 1.0) / 2.0")),
          lit(0.0)).as("pairs"),
        coalesce(sum(col("rb")), lit(0.0)).as("rb"))
      .collect()(0)
    widthFor(spark,
      satLong(row.getDouble(0) * bytesPerPair + math.max(0.0,
        row.getDouble(1))),
      targetBytes)
  }

  /** Width from a direct byte estimate (Σ `byteCol` × `expansion`) —
    * for shapes where the pair census itself would be expensive and a
    * calibrated linear expansion of a metadata column bounds the
    * in-flight volume (e.g. AllPairs: shuffle bytes track total text
    * bytes times a measured prefix-fan-out factor). */
  def bytesWidth(spark: SparkSession, keyed: DataFrame, byteCol: Column,
                 expansion: Long, targetBytes: Long = 32L << 20): Int = {
    // double census for the same wrap-proofing as pairWidth
    val total = keyed.agg(coalesce(sum(byteCol.cast("double")), lit(0.0)))
      .collect()(0).getDouble(0)
    widthFor(spark, satLong(math.max(0.0, total) * expansion), targetBytes)
  }

  /** Clamp a double byte estimate into [0, Long.MaxValue]: an extreme
    * census must saturate to the 4096 cap, never wrap negative past it
    * (NaN — a poisoned census — also saturates, failing wide). */
  private def satLong(d: Double): Long =
    if (java.lang.Double.isNaN(d) || d >= Long.MaxValue.toDouble)
      Long.MaxValue
    else if (d <= 0.0) 0L
    else d.toLong

  private def widthFor(spark: SparkSession, bytes: Long,
                       targetBytes: Long): Int = {
    val session = spark.conf.get("spark.sql.shuffle.partitions").toInt
    // overflow-safe ceil-div: bytes can be Long.MaxValue (saturated)
    val ceilDiv = bytes / targetBytes +
      (if (bytes % targetBytes > 0) 1L else 0L)
    math.max(session, math.min(4096L, ceilDiv).toInt)
  }
}
