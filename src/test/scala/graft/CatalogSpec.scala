package graft

import java.time.LocalDate

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Catalog, DataGen, Sinks}

/** S7–S10: generator domains/determinism, catalog DDL, partition sync,
  * verification, catalog insert — the bootstrap path of the reference's
  * init DAGs replayed on Spark's catalog. */
class CatalogSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  val d: LocalDate = LocalDate.parse("2026-01-13")

  test("DataGen: reference value domains, deterministic, id scheme") {
    val o = DataGen.orders(spark, d, 1000).collect()
    assert(o.length == 1000)
    assert(o.forall(r => (1 to 5).contains(r.getAs[Int]("product_id"))))
    assert(o.forall(r => (1 to 100).contains(r.getAs[Int]("quantity"))))
    assert(o.forall(r => Set("PENDING", "CONFIRMED", "SHIPPED", "DELIVERED")
      .contains(r.getAs[String]("status"))))
    assert(o.map(_.getAs[Long]("order_id")).min == 2026011300000L)
    val again = DataGen.orders(spark, d, 1000).collect()
    assert(o.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
    val inv = DataGen.inventory(spark, d, 5, 2).collect()
    assert(inv.length == 10)
    assert(inv.forall(r => (50 to 500).contains(r.getAs[Int]("available_qty"))))
    assert(inv.forall(r => (0 to 50).contains(r.getAs[Int]("reserved_qty"))))
    assert(inv.forall(r => (20 to 100).contains(r.getAs[Int]("safety_stock"))))
  }

  test("catalog: external partitioned table + partition sync + insert") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-cat").toString
    val orders = DataGen.orders(spark, d, 500)
    // files land first (the reference's upload-then-sync order)
    Sinks.writePartitionedParquet(orders, s"$tmp/orders", Seq("order_date"))

    Catalog.createDatabase(spark, "graft_test")
    Catalog.createExternalTable(spark, "graft_test.orders",
      orders.schema, Seq("order_date"), s"$tmp/orders")
    Catalog.syncPartitions(spark, "graft_test.orders")
    Catalog.verifyTables(spark, "graft_test", Seq("orders"))
    assert(spark.table("graft_test.orders").count() == 500)

    // partition pruning reaches the catalog table scan
    val pruned = spark.table("graft_test.orders")
      .filter(org.apache.spark.sql.functions.col("order_date") ===
        java.sql.Date.valueOf(d))
    assert(pruned.count() == 500)

    // a new day lands → sync picks it up
    Sinks.writePartitionedParquet(DataGen.orders(spark, d.plusDays(1), 250),
      s"$tmp/orders", Seq("order_date"))
    Catalog.syncPartitions(spark, "graft_test.orders")
    assert(spark.table("graft_test.orders").count() == 750)

    // catalog insert (S3)
    Catalog.insertInto(DataGen.orders(spark, d.plusDays(2), 100),
      "graft_test.orders")
    assert(spark.table("graft_test.orders").count() == 850)

    intercept[IllegalArgumentException] {
      Catalog.verifyTables(spark, "graft_test", Seq("orders", "nope"))
    }
    spark.sql("DROP TABLE graft_test.orders")
    spark.sql("DROP DATABASE graft_test")
  }
}
