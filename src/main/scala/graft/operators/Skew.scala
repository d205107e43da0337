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
}
