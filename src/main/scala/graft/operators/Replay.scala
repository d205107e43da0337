package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, IntegerType}

import graft.sources.Tables

/** Maps the driver's TPC-H-ish test tables (TESTDATA.md) onto the
  * reference's procurement schemas (FIXTURES.md §B role mapping), so every
  * Procurement stage runs — and is oracle-checked — on real data at any
  * scale factor.
  *
  * All derivations are deterministic, integer/decimal-exact, and mirrored
  * 1:1 by CTEs in the DuckDB oracle SQL (ParityQueries.OracleCtes):
  *  - doubles are cast to DECIMAL before any SUM (order-independent exact
  *    arithmetic in both engines);
  *  - double→int conversions go through floor() (Spark truncates on cast,
  *    DuckDB rounds — floor removes the ambiguity);
  *  - the supplier ranking gets supplier_id as a final tie-break so
  *    row_number is deterministic (SURVEY.md §2.5).
  *
  * Deliberate gaps that exercise the reference's null paths:
  *  - product_suppliers omits product_id % 10 == 0  → Q1 anti-join hits;
  *  - inventory omits product_id % 7 == 3           → Q2 anti-join hits and
  *    the COALESCE(ai.safety_stock, p.safety_stock_level) fallback (P6).
  */
object Replay {

  val Money: DecimalType = DecimalType(18, 2)

  /** Dim-shaped derivations (products/suppliers/product_suppliers) play the
    * role of master-data tables — in a real deployment these are
    * materialized once, not re-derived per query. Materialize them ONCE per
    * (session, dir) as real catalog tables (Parquet in tmp) and hand every
    * consumer the resulting catalog relation; facts stay scan-through
    * (never materialized — at 100 TB they don't fit and shouldn't:
    * partition pruning + pushdown make their scans cheap).
    *
    * Catalog tables rather than .persist(): a cached plan keeps the FULL
    * derivation tree in every consumer's logical plan, and each query then
    * pays cache-lookup canonicalization + optimization over that tree —
    * measured ~0.25-0.4s per query on the 5-dim MRP plans. A catalog
    * relation is a leaf: the same queries re-plan in ~0.1s. This also
    * mirrors the reference, where master data lives in real tables
    * (ddl_postgres.sql), not in a session cache.
    */
  private def memoDim(spark: SparkSession, dir: String, name: String,
                      bucketCols: Seq[String] = Nil)
                     (build: => DataFrame): DataFrame =
    graft.sources.Tables.memoTable(spark, dir, s"dim_$name", bucketCols)(build)

  /** orders fact ← lineitem (reference orders: trino_init_tables_dag.py:39-51). */
  def orders(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem").select(
      col("l_orderkey").as("order_id"),
      col("l_partkey").as("product_id"),
      col("l_quantity").cast(IntegerType).as("quantity"),
      col("l_returnflag").as("status"),
      to_date(col("l_shipdate")).as("order_date"))

  /** inventory fact ← lineitem (reference inventory: trino_init_tables_dag.py:54-67).
    * Gap: product_id % 7 == 3 has no snapshot (drives Q2 + P6 fallback). */
  def inventory(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem")
      .filter(col("l_partkey") % 7 =!= 3)
      .select(
        col("l_partkey").as("product_id"),
        (col("l_quantity").cast(IntegerType) * 3).as("available_qty"),
        floor(col("l_quantity") * col("l_discount") * 10)
          .cast(IntegerType).as("reserved_qty"),
        (col("l_linenumber") * 10).as("safety_stock"),
        (col("l_suppkey") % 3).cast(IntegerType).as("warehouse_id"),
        to_date(col("l_shipdate")).as("snapshot_date"))

  /** products dim ← part (reference products: ddl_postgres.sql:8-19);
    * is_active := p_size % 7 <> 0. */
  def products(spark: SparkSession, dir: String): DataFrame =
    memoDim(spark, dir, "products") {
    Tables.load(spark, dir, "part").select(
      col("p_partkey").as("product_id"),
      col("p_name").as("product_name"),
      col("p_size").as("safety_stock_level"),
      (col("p_size") % 7 =!= 0).as("is_active"))
    }

  /** suppliers dim ← supplier (reference suppliers: ddl_postgres.sql:22-32);
    * is_active := s_acctbal > 1000. */
  def suppliers(spark: SparkSession, dir: String): DataFrame =
    memoDim(spark, dir, "suppliers") {
      Tables.load(spark, dir, "supplier").select(
        col("s_suppkey").as("supplier_id"),
        col("s_name").as("supplier_name"),
        (col("s_acctbal") > 1000.0).as("is_active"))
    }

  /** product_suppliers mapping ← lineitem pairs (reference: ddl_postgres.sql:35-42).
    * unit_cost = min extendedprice as DECIMAL; priority = suppkey%5+1.
    * Gap: product_id % 10 == 0 unmapped (drives Q1). */
  def productSuppliers(spark: SparkSession, dir: String): DataFrame =
    // bucketed on its join/window key: the ranking window (partitionBy
    // product_id) and any co-located consumer plan with NO exchange
    memoDim(spark, dir, "product_suppliers", bucketCols = Seq("product_id")) {
      Tables.load(spark, dir, "lineitem")
        .filter(col("l_partkey") % 10 =!= 0)
        .groupBy(col("l_partkey").as("product_id"),
          col("l_suppkey").as("supplier_id"))
        .agg(min(col("l_extendedprice").cast(Money)).as("unit_cost"))
        .withColumn("priority", (col("supplier_id") % 5).cast(IntegerType) + 1)
    }

  /** The replay's "daily" windows (P2): orders drawn from 1996, inventory
    * snapshots from 1995 — ranges rather than a single day so every scale
    * factor has rows, while keeping the pruning-predicate shape. */
  val ordersFrom = "1996-01-01"
  val ordersTo = "1997-01-01"
  val invFrom = "1995-01-01"
  val invTo = "1996-01-01"

  def ordersWhen: org.apache.spark.sql.Column =
    col("order_date") >= lit(java.sql.Date.valueOf(ordersFrom)) &&
      col("order_date") < lit(java.sql.Date.valueOf(ordersTo))

  def inventoryWhen: org.apache.spark.sql.Column =
    col("snapshot_date") >= lit(java.sql.Date.valueOf(invFrom)) &&
      col("snapshot_date") < lit(java.sql.Date.valueOf(invTo))
}
