package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for the 100 TB posture. AQE's skew-join
  * handling covers sort-merge joins at runtime; these cover the two cases
  * it doesn't: hot-key aggregation pressure and broadcast-infeasible
  * skewed equi-joins with a known/bounded hot side.
  */
object Skew {

  /** Two-stage salted aggregation: groupBy(keys + salt) partial-aggregates
    * hot keys across `saltBuckets` reducers, then a cheap second aggregate
    * over the (now ≤ saltBuckets rows per key) partials merges them.
    *
    * `partials` maps column name → partial aggregate; `merge` maps the
    * same names → final merge aggregate (e.g. sum→sum, count→sum,
    * max→max). Algebraic (sum/count/min/max) aggregates only.
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], saltBuckets: Int,
                partials: Map[String, Column],
                merge: Map[String, Column]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(),
        lit(saltBuckets)))
    val partial = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partials.head._2.as(partials.head._1),
        partials.tail.map { case (n, c) => c.as(n) }.toSeq: _*)
    partial
      .groupBy(keys.map(col): _*)
      .agg(merge.head._2.as(merge.head._1),
        merge.tail.map { case (n, c) => c.as(n) }.toSeq: _*)
  }

  /** Salted equi-join for a skewed left side against a small-but-not-
    * broadcastable right side: left rows get a random-ish salt in
    * [0, saltBuckets), the right side is replicated `saltBuckets`× with an
    * exploded salt column, and the join key becomes (key, salt) — hot keys
    * spread over `saltBuckets` reducers instead of one.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 saltBuckets: Int, joinType: String = "inner"): DataFrame = {
    val saltedLeft = left.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(),
        lit(saltBuckets)))
    val replicatedRight = right.withColumn("__salt",
      explode(array((0 until saltBuckets).map(i => lit(i.toLong)): _*)))
    saltedLeft.join(replicatedRight, Seq(key, "__salt"), joinType)
      .drop("__salt")
  }

  /** Join-shape diagnostic — the numbers a skew investigation (and a
    * planner) needs EXACTLY, computed before running the join: per-side
    * row and distinct-key counts, the matching-key count, the exact
    * inner-join output cardinality Σ_k cnt_a(k)·cnt_b(k), and the
    * single heaviest key with its contribution (deciding whether
    * [[saltedJoin]] / AQE skew handling is warranted and how much one
    * key dominates).
    *
    * Cost: two key-count aggregates (map-side combinable, count-table-
    * sized results), their equi-join, and three one-row reductions —
    * the standard stats-collection pass, never the join itself. All
    * outputs are exact integers (oracle-checked, q125). */
  def joinDiagnostics(a: DataFrame, aKey: String, b: DataFrame,
                      bKey: String): DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    val ca = a.groupBy(col(aKey).cast("long").as("k"))
      .agg(count(lit(1)).as("ca"))
    val cb = b.groupBy(col(bKey).cast("long").as("k"))
      .agg(count(lit(1)).as("cb"))
    val j = ca.join(cb, Seq("k"))
      .select(col("k"), (col("ca") * col("cb")).as("contrib"))
    val joined = j.agg(
      count(lit(1)).as("n_matching_keys"),
      coalesce(sum(col("contrib")), lit(0L)).as("out_rows"),
      max(struct(col("contrib"), col("k"))).as("top"))
      .select(col("n_matching_keys"), col("out_rows"),
        col("top.k").as("top_key"),
        col("top.contrib").as("top_contrib"))
    val sa = ca.agg(coalesce(sum(col("ca")), lit(0L)).as("n_a"),
      count(lit(1)).as("ndv_a"))
    val sb = cb.agg(coalesce(sum(col("cb")), lit(0L)).as("n_b"),
      count(lit(1)).as("ndv_b"))
    broadcast(sa).crossJoin(broadcast(sb)).crossJoin(joined)
  }
}
