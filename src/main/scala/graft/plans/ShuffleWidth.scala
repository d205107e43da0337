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
    val row = keyed
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("c"), sum(rowBytes.cast("long")).as("rb"))
      .agg(
        coalesce(sum(expr("c * (c - 1) div 2")), lit(0L)).as("pairs"),
        coalesce(sum(col("rb")), lit(0L)).as("rb"))
      .collect()(0)
    widthFor(spark, mulSat(row.getLong(0), bytesPerPair) + row.getLong(1),
      targetBytes)
  }

  /** Width from a direct byte estimate (Σ `byteCol` × `expansion`) —
    * for shapes where the pair census itself would be expensive and a
    * calibrated linear expansion of a metadata column bounds the
    * in-flight volume (e.g. AllPairs: shuffle bytes track total text
    * bytes times a measured prefix-fan-out factor). */
  def bytesWidth(spark: SparkSession, keyed: DataFrame, byteCol: Column,
                 expansion: Long, targetBytes: Long = 32L << 20): Int = {
    val total = keyed.agg(coalesce(sum(byteCol.cast("long")), lit(0L)))
      .collect()(0).getLong(0)
    widthFor(spark, mulSat(total, expansion), targetBytes)
  }

  /** Saturating multiply (both operands nonnegative): an extreme census
    * must clamp to the 4096 cap, never wrap negative past it. */
  private def mulSat(a: Long, b: Long): Long =
    if (a > 0 && b > 0 && a > Long.MaxValue / b) Long.MaxValue else a * b

  private def widthFor(spark: SparkSession, bytes: Long,
                       targetBytes: Long): Int = {
    val session = spark.conf.get("spark.sql.shuffle.partitions").toInt
    // overflow-safe ceil-div: bytes can be Long.MaxValue (saturated)
    val ceilDiv = bytes / targetBytes +
      (if (bytes % targetBytes > 0) 1L else 0L)
    math.max(session, math.min(4096L, ceilDiv).toInt)
  }
}
