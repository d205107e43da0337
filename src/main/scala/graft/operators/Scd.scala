package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD2 (slowly-changing-dimension, type 2) interval maintenance over an
  * event log keyed by (key, value, ts, seq):
  *
  *  - [[build]] compresses the full log into validity intervals (q79);
  *  - [[applyBatch]] folds a NEW slice of events into a standing SCD2
  *    table without re-reading history — the warehouse-side upsert, and
  *    the third "standing artifact maintained incrementally" alongside
  *    the near-dup index (q67) and the ANN quantizer (q86). The q93
  *    oracle is the FULL-history rebuild: applied ≡ rebuilt,
  *    hash-checked.
  *
  * The incremental equivalence rests on one property of run compression:
  * the last event of a key always carries the status of its OPEN
  * interval (runs are maximal), so seeding the batch's change detection
  * with each key's current row sees exactly what full-history lag saw.
  * Contract: every batch event is strictly later than every standing
  * event for its key (a daily slice).
  */
object Scd {

  private val cols =
    Seq("customer_id", "change_key", "status", "valid_from")

  /** Full build: change rows via lag, valid_to via lead OVER THE CHANGE
    * ROWS, open-ended current row. One shuffle on the key. */
  def build(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    orders
      .withColumn("prev", lag(col("o_orderstatus"), 1).over(w))
      .filter(col("prev").isNull || col("prev") =!= col("o_orderstatus"))
      .withColumn("valid_to", lead(col("o_orderdate"), 1).over(w))
      .select(col("o_custkey").as("customer_id"),
        col("o_orderkey").as("change_key"),
        col("o_orderstatus").as("status"),
        col("o_orderdate").as("valid_from"),
        col("valid_to"),
        col("valid_to").isNull.as("is_current"))
  }

  /** Fold a new slice of orders into a standing SCD2 table. Closed rows
    * pass through untouched; each key's current row closes if (and only
    * if) the batch changes its status; batch change rows chain among
    * themselves. Cost: the standing CURRENT rows (one per key) + the
    * batch — history is never re-read. */
  def applyBatch(standing: DataFrame, batch: DataFrame): DataFrame = {
    val seed = standing.filter(col("is_current"))
      .select(cols.map(col): _*).withColumn("_seed", lit(true))
    val b = batch.select(col("o_custkey").as("customer_id"),
        col("o_orderkey").as("change_key"),
        col("o_orderstatus").as("status"),
        col("o_orderdate").as("valid_from"))
      .withColumn("_seed", lit(false))
    val w = Window.partitionBy(col("customer_id"))
      .orderBy(col("valid_from"), col("change_key"))
    // change detection seeded by the current row (= the status full-
    // history lag would have seen; see scaladoc)
    val newChanges = seed.unionByName(b)
      .withColumn("prev", lag(col("status"), 1).over(w))
      .filter(!col("_seed")
        && (col("prev").isNull || col("prev") =!= col("status")))
      .select(cols.map(col): _*).withColumn("_seed", lit(false))
    // interval chaining across seed ∪ new changes: the seed row's lead
    // closes the standing current row; new change rows chain onward
    val chained = seed.unionByName(newChanges)
      .withColumn("valid_to", lead(col("valid_from"), 1).over(w))
      .select(cols.map(col) :+ col("valid_to")
        :+ col("valid_to").isNull.as("is_current") :+ col("_seed"): _*)
    standing.filter(!col("is_current"))
      .unionByName(chained.drop("_seed"))
  }
}
