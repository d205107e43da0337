package graft.sources

import java.time.LocalDate

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** S7 — synthetic data generator, the Spark twin of the reference's
  * Faker-based generator (docker/dags/hdfs_upload_data_dag.py:89-117):
  * `num_orders` orders/day uniform over `numProducts` products, qty 1-100,
  * four statuses, order_id = YYYYMMDD##### ; one inventory snapshot per
  * (product, warehouse) with the reference's value domains.
  *
  * Deterministic by construction (hash-derived, no RNG state): the same
  * (date, n) always generates the same rows, on any cluster layout —
  * `spark.range` is evenly partitioned, so generation scales linearly with
  * executors and never shuffles.
  */
object DataGen {

  private val statuses = array(
    lit("PENDING"), lit("CONFIRMED"), lit("SHIPPED"), lit("DELIVERED"))

  private def pick(seed: String, mod: Int): org.apache.spark.sql.Column =
    pmod(hash(col("id"), lit(seed)), lit(mod))

  /** Orders for one day (hdfs_upload_data_dag.py:89-102). */
  def orders(spark: SparkSession, d: LocalDate, numOrders: Long,
             numProducts: Int = 5): DataFrame = {
    val dayPrefix = d.toString.replace("-", "").toLong * 100000L
    spark.range(numOrders).select(
      (lit(dayPrefix) + col("id")).as("order_id"),
      (pick("product", numProducts) + 1).cast(IntegerType).as("product_id"),
      (pick("qty", 100) + 1).cast(IntegerType).as("quantity"),
      element_at(statuses, (pick("status", 4) + 1).cast(IntegerType))
        .as("status"),
      lit(java.sql.Date.valueOf(d)).as("order_date"))
  }

  /** Inventory snapshots for one day (hdfs_upload_data_dag.py:104-117):
    * available 50-500, reserved 0-50, safety 20-100. */
  def inventory(spark: SparkSession, d: LocalDate, numProducts: Int = 5,
                numWarehouses: Int = 1): DataFrame =
    spark.range(numProducts.toLong * numWarehouses).select(
      ((col("id") % numProducts) + 1).cast(IntegerType).as("product_id"),
      (pick("avail", 451) + 50).cast(IntegerType).as("available_qty"),
      pick("reserved", 51).cast(IntegerType).as("reserved_qty"),
      (pick("safety", 81) + 20).cast(IntegerType).as("safety_stock"),
      ((col("id") / numProducts) + 1).cast(IntegerType).as("warehouse_id"),
      lit(java.sql.Date.valueOf(d)).as("snapshot_date"))
}
