package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Declared schemas for the reference's tables (SURVEY.md §1.2 — fixed DDL,
  * no inference: docker/dags/trino_init_tables_dag.py:33-96,
  * docker/dags/sql/ddl_postgres.sql:8-42) and a conformance validator for
  * reads from schemaless edges (CSV staging, JDBC with driver-widened
  * types).
  */
object Schemas {

  val orders: StructType = StructType(Seq(
    StructField("order_id", LongType, nullable = false),
    StructField("product_id", IntegerType, nullable = false),
    StructField("quantity", IntegerType, nullable = false),
    StructField("status", StringType),
    StructField("order_date", DateType, nullable = false)))

  val inventory: StructType = StructType(Seq(
    StructField("product_id", IntegerType, nullable = false),
    StructField("available_qty", IntegerType),
    StructField("reserved_qty", IntegerType),
    StructField("safety_stock", IntegerType),
    StructField("warehouse_id", IntegerType),
    StructField("snapshot_date", DateType, nullable = false)))

  val products: StructType = StructType(Seq(
    StructField("product_id", IntegerType, nullable = false),
    StructField("product_name", StringType),
    StructField("product_code", StringType),
    StructField("category", StringType),
    StructField("unit_price", DecimalType(10, 2)),
    StructField("safety_stock_level", IntegerType),
    StructField("min_order_quantity", IntegerType),
    StructField("is_active", BooleanType)))

  val suppliers: StructType = StructType(Seq(
    StructField("supplier_id", IntegerType, nullable = false),
    StructField("supplier_name", StringType),
    StructField("supplier_code", StringType),
    StructField("contact_email", StringType),
    StructField("contact_phone", StringType),
    StructField("lead_time_days", IntegerType),
    StructField("reliability_score", DecimalType(3, 2)),
    StructField("is_active", BooleanType)))

  val productSuppliers: StructType = StructType(Seq(
    StructField("product_id", IntegerType, nullable = false),
    StructField("supplier_id", IntegerType, nullable = false),
    StructField("unit_cost", DecimalType(10, 2)),
    StructField("priority", IntegerType),
    StructField("is_preferred", BooleanType)))

  val aggregatedOrders: StructType = StructType(Seq(
    StructField("product_id", IntegerType),
    StructField("total_quantity", IntegerType),
    StructField("order_count", IntegerType),
    StructField("order_date", DateType)))

  val netDemand: StructType = StructType(Seq(
    StructField("product_id", IntegerType),
    StructField("product_name", StringType),
    StructField("supplier_id", IntegerType),
    StructField("supplier_name", StringType),
    StructField("net_demand", IntegerType),
    StructField("unit_cost", DecimalType(10, 2)),
    StructField("estimated_cost", DecimalType(10, 2)),
    StructField("calculation_date", DateType)))

  /** Conform a frame to a declared schema: project columns in declared
    * order, cast to declared types (a widening CSV/JDBC read narrows back
    * exactly), error on missing columns. Extra columns are dropped.
    */
  def conform(df: DataFrame, schema: StructType): DataFrame = {
    val have = df.columns.toSet
    val missing = schema.fields.filterNot(f => have.contains(f.name))
    require(missing.isEmpty,
      s"missing columns: ${missing.map(_.name).mkString(", ")}")
    df.select(schema.fields.toSeq.map(f =>
      col(f.name).cast(f.dataType).as(f.name)): _*)
  }
}
