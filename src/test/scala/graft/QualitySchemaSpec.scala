package graft

import java.time.LocalDate

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Quality
import graft.sources.Schemas

class QualitySchemaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("rule engine reproduces the reference exception set + custom rules") {
    val p = new ProcurementSpec
    val d = LocalDate.parse("2026-01-13")
    val base = Quality.exceptions(
      Quality.referenceRules(p.orders, p.inventory, p.productSuppliers, d))
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(base == Set(
      ("MISSING_SUPPLIER_MAPPING", "HIGH", 7),
      ("MISSING_INVENTORY", "MEDIUM", 3),
      ("MISSING_INVENTORY", "MEDIUM", 7)))

    val badOrders = p.orders.unionByName(
      Seq((9L, 2, -5, "PENDING", java.sql.Date.valueOf(d)))
        .toDF("order_id", "product_id", "quantity", "status", "order_date"))
    val withCustom = Quality.exceptions(
      Quality.referenceRules(badOrders, p.inventory, p.productSuppliers, d) :+
        Quality.Rule("NON_POSITIVE_QTY", "HIGH",
          Quality.nonPositiveQuantity(badOrders)))
      .collect().map(r => (r.getString(0), r.getInt(2))).toSet
    assert(withCustom.contains(("NON_POSITIVE_QTY", 2)))
  }

  test("conform: casts widened CSV-style types back to the declared schema " +
    "and errors on missing columns") {
    val widened = Seq((1L, 2L, 3L, "PENDING", "2026-01-13"))
      .toDF("order_id", "product_id", "quantity", "status", "order_date")
    val conformed = Schemas.conform(widened, Schemas.orders)
    assert(conformed.schema.fields.map(f => f.name -> f.dataType.sql).toSeq
      == Schemas.orders.fields.map(f => f.name -> f.dataType.sql).toSeq)
    val r = conformed.collect().head
    assert(r.getAs[Int]("product_id") == 2)
    assert(r.getAs[java.sql.Date]("order_date")
      == java.sql.Date.valueOf("2026-01-13"))
    intercept[IllegalArgumentException] {
      Schemas.conform(widened.drop("status"), Schemas.orders)
    }
  }
}
