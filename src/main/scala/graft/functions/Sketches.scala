package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable bounded-state sketches. The motivating contrast at 100 TB:
  * exact COUNT(DISTINCT x) per group is a two-phase plan whose first
  * shuffle carries every distinct value; a KMV sketch carries k longs per
  * group — the classic accuracy-for-bytes trade, with the estimate's
  * standard error ~ 1/sqrt(k-2).
  */
object Sketches {

  /** The k smallest DISTINCT longs of the group, ascending
    * (graft.plans.MinKAgg — a mergeable TypedImperativeAggregate; partial
    * buffers are capped at k longs). */
  def minK(values: Column, k: Int): Column =
    org.apache.spark.sql.graftops.ColumnBridge.column(
      graft.plans.MinKAgg(
        org.apache.spark.sql.graftops.ColumnBridge.expression(values), k)
        .toAggregateExpression())

  /** KMV (k minimum values) distinct-count estimate per group, over the
    * portable 60-bit md5 hash family (Dedup.md5Hash64) so the whole
    * computation — hashes, k-th minimum, estimate arithmetic — is
    * reproducible in any engine with md5.
    *
    * For a group with ≥ k distinct values the k-th smallest hash h_k
    * estimates cardinality as (k-1) · S / h_k with S = 2^60 the hash
    * space; with fewer than k the sketch degenerates to the exact count
    * (the buffer simply holds every distinct hash). Emits the k-th hash
    * itself (exact integer — the oracle-pinnable part) alongside the
    * rounded estimate.
    *
    * Scale: the only state per group crossing the shuffle is the bounded
    * MinKAgg buffer. Hash collisions at 60 bits are negligible at any
    * realistic group cardinality (~2^30 before birthday effects).
    */
  def kmvDistinct(rows: DataFrame, groupCol: String, valueCol: String,
                  k: Int): DataFrame = {
    val space = math.pow(2.0, 60)
    rows.select(col(groupCol), Dedup.md5Hash64(col(valueCol)).as("h"))
      .groupBy(col(groupCol))
      .agg(minK(col("h"), k).as("mins"))
      .select(col(groupCol), size(col("mins")).cast("long").as("n_mins"),
        when(size(col("mins")) === k,
          element_at(col("mins"), k)).as("kth_hash"))
      .withColumn("est_distinct",
        when(col("kth_hash").isNotNull,
          round(lit((k - 1).toDouble) * lit(space)
            / col("kth_hash").cast("double"), 3))
          .otherwise(col("n_mins").cast("double")))
  }
}
