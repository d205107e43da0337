package graft

import java.nio.file.{Files, Paths}
import java.time.LocalDate

import org.scalatest.funsuite.AnyFunSuite

/** End-to-end daily pipeline over the FIXTURES.md §A edge-case day:
  * aggregate → net-demand → export JSONs → quality checks → exception log,
  * plus idempotency of the partitioned writes (SURVEY.md §5.5).
  */
class PipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("runDay writes tables, supplier JSONs and exception log; re-run " +
    "does not duplicate") {
    val p = new ProcurementSpec
    val tmp = Files.createTempDirectory("graft-pipe").toString
    val conf = Pipeline.Config(
      warehouseDir = s"$tmp/warehouse", outputDir = s"$tmp/output",
      logsDir = s"$tmp/logs", dataDate = LocalDate.parse("2026-01-13"),
      generatedAt = "2026-01-14T00:00:00")

    val r1 = Pipeline.runDay(spark, p.orders, p.inventory, p.products,
      p.suppliers, p.productSuppliers, conf)
    assert(r1.netDemandRows == 2)
    assert(r1.exportedFiles.size == 2)
    assert(r1.exceptionCount == 3)
    assert(r1.exceptionLogPath.exists(f => Files.exists(Paths.get(f))))

    val json = Files.readString(
      Paths.get(r1.exportedFiles.find(_.endsWith("supplier_11.json")).get))
    assert(json.contains("\"supplier_name\": \"Bolt\""))
    assert(json.contains("\"total_estimated_cost\": 160.00"))
    assert(json.contains("\"order_date\": \"2026-01-14\""))

    // idempotency: second run overwrites the same partition, no dup rows
    Pipeline.runDay(spark, p.orders, p.inventory, p.products,
      p.suppliers, p.productSuppliers, conf)
    val nd = spark.read.parquet(s"$tmp/warehouse/net_demand")
    assert(nd.count() == 2)
    val agg = spark.read.parquet(s"$tmp/warehouse/aggregated_orders")
    assert(agg.count() == 5)
  }
}
