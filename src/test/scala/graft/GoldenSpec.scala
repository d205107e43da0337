package graft

import java.time.LocalDate

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Procurement

/** Golden replay of the reference's committed sample run (SURVEY.md §5.3):
  *  - raw day 2026-01-13: the committed 1,000-order / 5-snapshot CSVs
  *    (docker/data/raw/{orders,stock}/2026-01-13/);
  *  - export day 2026-01-14 → order date 2026-01-15: the committed
  *    supplier_{1,2,3}.json documents
  *    (docker/data/output/supplier_orders/2026-01-15/) — a day with no
  *    orders/inventory, so demand = safety stock for every product, via
  *    each product's preferred (rank-1) supplier.
  * Master data is the ddl_postgres.sql:51-82 seed set.
  */
class GoldenSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val ref = "/root/reference/docker/data"

  def bd(s: String): BigDecimal = BigDecimal(s)

  lazy val products: DataFrame = Seq(
    (1, "Widget A", 100, true), (2, "Widget B", 50, true),
    (3, "Component X", 200, true), (4, "Component Y", 150, true),
    (5, "Assembly Kit", 30, true)
  ).toDF("product_id", "product_name", "safety_stock_level", "is_active")

  lazy val suppliers: DataFrame = Seq(
    (1, "TechSupply Co", true), (2, "Global Parts Inc", true),
    (3, "FastShip Ltd", true)
  ).toDF("supplier_id", "supplier_name", "is_active")

  lazy val productSuppliers: DataFrame = Seq(
    (1, 1, bd("20.00"), 1), (1, 2, bd("22.00"), 2),
    (2, 1, bd("35.00"), 1), (2, 3, bd("38.00"), 2),
    (3, 2, bd("10.00"), 1), (3, 3, bd("11.00"), 2),
    (4, 2, bd("15.00"), 1), (4, 1, bd("16.00"), 2),
    (5, 3, bd("60.00"), 1), (5, 1, bd("65.00"), 2)
  ).toDF("product_id", "supplier_id", "unit_cost", "priority")

  def emptyOrders: DataFrame = Seq.empty[(Long, Int, Int, String, java.sql.Date)]
    .toDF("order_id", "product_id", "quantity", "status", "order_date")
  def emptyInventory: DataFrame =
    Seq.empty[(Int, Int, Int, Int, Int, java.sql.Date)]
      .toDF("product_id", "available_qty", "reserved_qty", "safety_stock",
        "warehouse_id", "snapshot_date")

  test("committed 2026-01-13 CSVs aggregate to the day's totals") {
    val orders = spark.read.option("header", "true")
      .option("inferSchema", "true")
      .csv(s"$ref/raw/orders/2026-01-13/orders_2026-01-13_222831.csv")
      .withColumn("order_date", to_date(col("order_date")))
    assert(orders.count() == 1000)
    val agg = Procurement.aggregateOrders(orders,
      LocalDate.parse("2026-01-13"))
    val rows = agg.collect()
    assert(rows.map(_.getAs[Int]("product_id")).toSet == Set(1, 2, 3, 4, 5))
    assert(rows.map(_.getAs[Int]("order_count")).sum == 1000)
    val csvTotal = orders.agg(sum("quantity")).collect().head.getLong(0)
    assert(rows.map(_.getAs[Int]("total_quantity").toLong).sum == csvTotal)
  }

  test("empty-day export reproduces the committed supplier_{1,2,3}.json") {
    val d = LocalDate.parse("2026-01-14")
    val nd = Procurement.netDemand(emptyOrders, emptyInventory, products,
      suppliers, productSuppliers, d)
    val docs = Procurement.supplierOrders(nd, d, d.plusDays(1),
      "2026-01-13T22:29:30").collect()
      .map(r => r.getAs[Int]("supplier_id") -> r).toMap

    val golden = spark.read.option("multiLine", "true")
      .json(s"$ref/output/supplier_orders/2026-01-15/")
      .collect().map(r => r.getAs[Long]("supplier_id").toInt -> r).toMap

    assert(docs.keySet == golden.keySet && docs.keySet == Set(1, 2, 3))
    for (id <- docs.keySet) {
      val got = docs(id); val exp = golden(id)
      assert(got.getAs[String]("supplier_name")
        == exp.getAs[String]("supplier_name"))
      assert(got.getAs[String]("order_date") == exp.getAs[String]("order_date"))
      assert(got.getAs[String]("data_date") == exp.getAs[String]("data_date"))
      assert(got.getAs[java.math.BigDecimal]("total_estimated_cost")
        .doubleValue() == exp.getAs[Double]("total_estimated_cost"))
      val gotItems = got.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("items")
        .map(i => (i.getAs[Int]("product_id"), i.getAs[String]("product_name"),
          i.getAs[Int]("quantity"),
          i.getAs[java.math.BigDecimal]("unit_cost").doubleValue(),
          i.getAs[java.math.BigDecimal]("total_cost").doubleValue()))
      val expItems = exp.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("items")
        .map(i => (i.getAs[Long]("product_id").toInt,
          i.getAs[String]("product_name"), i.getAs[Long]("quantity").toInt,
          i.getAs[Double]("unit_cost"), i.getAs[Double]("total_cost")))
        .sortBy(_._1)
      assert(gotItems.sortBy(_._1) == expItems,
        s"items mismatch for supplier $id")
    }
  }

  test("full-day net demand over the committed CSVs is MRP-consistent") {
    val d = LocalDate.parse("2026-01-13")
    val orders = spark.read.option("header", "true")
      .option("inferSchema", "true")
      .csv(s"$ref/raw/orders/2026-01-13/orders_2026-01-13_222831.csv")
      .withColumn("order_date", to_date(col("order_date")))
    val inventory = spark.read.option("header", "true")
      .option("inferSchema", "true")
      .csv(s"$ref/raw/stock/2026-01-13/stock_2026-01-13_222837.csv")
      .withColumn("snapshot_date", to_date(col("snapshot_date")))
    val nd = Procurement.netDemand(orders, inventory, products, suppliers,
      productSuppliers, d).collect()
    assert(nd.nonEmpty)
    // estimated_cost == net_demand × unit_cost for every row (P8)
    nd.foreach { r =>
      val expect = new java.math.BigDecimal(r.getAs[Long]("net_demand"))
        .multiply(r.getAs[java.math.BigDecimal]("unit_cost"))
      assert(r.getAs[java.math.BigDecimal]("estimated_cost")
        .compareTo(expect) == 0)
    }
    // exactly one supplier per product (W1)
    val perProduct = nd.groupBy(_.getAs[Int]("product_id"))
    assert(perProduct.values.forall(_.length == 1))
  }
}
