package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for the 100 TB posture. AQE's skew-join
  * handling covers sort-merge joins at runtime; these cover the two cases
  * it doesn't: hot-key aggregation pressure and broadcast-infeasible
  * skewed equi-joins with a known/bounded hot side.
  */
object Skew {

  /** Key column as a long for count/Bloom machinery: integral types
    * cast (cheap, value-preserving — the numeric fast path); everything
    * else routes through the portable 60-bit md5 hash of the string
    * image. A plain long cast on a non-numeric key yields NULL for
    * every row and silently degenerates the consumer (empty Bloom
    * filter, empty diagnostics) — the failure mode this dispatch
    * removes. Both sides of a join must use the same encoding, so
    * callers pass BOTH types and the hash engages if EITHER side is
    * non-integral. */
  private[operators] def portableKey(
      dtA: org.apache.spark.sql.types.DataType,
      dtB: org.apache.spark.sql.types.DataType, c: Column): Column = {
    import org.apache.spark.sql.types._
    def integral(dt: DataType): Boolean = dt match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    if (integral(dtA) && integral(dtB)) c.cast("long")
    else graft.functions.Dedup.md5Hash64(c.cast("string"))
  }

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
    * outputs are exact integers (oracle-checked, q125). Integral keys
    * count under their long value (top_key IS the key); other types
    * count under their portable md5-60 image (top_key is that image —
    * resolve it back by hashing candidate keys), instead of the silent
    * all-NULL degeneration a blind long cast produced. */
  def joinDiagnostics(a: DataFrame, aKey: String, b: DataFrame,
                      bKey: String): DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    val (dta, dtb) = (a.schema(aKey).dataType, b.schema(bKey).dataType)
    val ca = a.groupBy(portableKey(dta, dtb, col(aKey)).as("k"))
      .agg(count(lit(1)).as("ca"))
    val cb = b.groupBy(portableKey(dta, dtb, col(bKey)).as("k"))
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

  /** What [[autoJoin]] decided and the numbers it decided from. */
  final case class AutoJoinReport(choice: String, nA: Long, nB: Long,
      outRows: Long, topKey: Option[Long], topContrib: Long)

  /** Diagnostic-DRIVEN inner equi-join router — the consumer
    * [[joinDiagnostics]] was built for: run the stats pass, then route
    *  - "broadcast" when the right side fits under `broadcastRowLimit`
    *    rows (an explicit hint — the dim-contract case AQE's stage-size
    *    estimate can get wrong, see the verify notes on cached stages),
    *  - "salted" when no single reducer should own the heaviest key:
    *    the top key contributes more than `skewTopFrac` of the exact
    *    join output ([[saltedJoin]] spreads it over `saltBuckets`
    *    reducers; AQE's skew handling only splits map-side partitions
    *    of sort-merge joins — a hot KEY still lands on one reducer),
    *  - "plain" otherwise (shuffled equi-join, AQE free to adapt).
    * The routed output is the SAME multiset for every choice (SkewSpec
    * pins all three against the plain join); only the physical shape
    * differs. Cost: the diagnostic pass (two key-count aggregates + a
    * 1-row driver read — the decide-before-you-shuffle trade at
    * 100 TB, where one mis-shaped join costs more than any number of
    * count passes). */
  def autoJoin(a: DataFrame, b: DataFrame, key: String,
               broadcastRowLimit: Long = 1000000L,
               skewTopFrac: Double = 0.2,
               saltBuckets: Int = 8): (DataFrame, AutoJoinReport) = {
    require(broadcastRowLimit >= 0 && saltBuckets > 0 &&
      skewTopFrac > 0 && skewTopFrac <= 1,
      s"bad autoJoin knobs: $broadcastRowLimit/$skewTopFrac/$saltBuckets")
    val d = joinDiagnostics(a, key, b, key).collect().head
    val (nA, nB, outRows) =
      (d.getAs[Long]("n_a"), d.getAs[Long]("n_b"),
        d.getAs[Long]("out_rows"))
    val topKey = Option(d.getAs[Any]("top_key"))
      .map(_.asInstanceOf[Long])
    val topContrib =
      if (d.isNullAt(d.fieldIndex("top_contrib"))) 0L
      else d.getAs[Long]("top_contrib")
    val choice =
      if (nB <= broadcastRowLimit) "broadcast"
      else if (outRows > 0 &&
        topContrib.toDouble > skewTopFrac * outRows.toDouble) "salted"
      else "plain"
    val joined = choice match {
      case "broadcast" => a.join(broadcast(b), Seq(key))
      case "salted" => saltedJoin(a, b, key, saltBuckets)
      case _ => a.join(b, Seq(key))
    }
    (joined, AutoJoinReport(choice, nA, nB, outRows, topKey, topContrib))
  }
}
