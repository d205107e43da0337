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

  test("backfillAggregates: one ranged scan covers multiple days and " +
    "overwrites only its partitions") {
    val spark2 = spark
    import spark2.implicits._
    val tmp = Files.createTempDirectory("graft-backfill").toString
    def day(d: String, ids: Seq[Long]) = ids.map(i =>
      (i, (i % 3).toInt + 1, 10, "PENDING", java.sql.Date.valueOf(d)))
    val orders = (day("2026-02-01", 1L to 30L) ++ day("2026-02-02", 31L to 50L)
      ++ day("2026-02-03", 51L to 55L))
      .toDF("order_id", "product_id", "quantity", "status", "order_date")

    val n = Pipeline.backfillAggregates(spark, orders, tmp,
      LocalDate.parse("2026-02-01"), LocalDate.parse("2026-02-03"))
    val table = spark.read.parquet(s"$tmp/aggregated_orders")
    // two days in range, day 3 excluded
    assert(table.select("order_date").distinct().count() == 2)
    val firstCount = table.count()
    assert(n == firstCount)

    // extending the backfill replaces overlapping partitions (day 2) and
    // adds the new one (day 3: products {1,2,3} → 3 groups)
    Pipeline.backfillAggregates(spark, orders, tmp,
      LocalDate.parse("2026-02-02"), LocalDate.parse("2026-02-04"))
    val after = spark.read.parquet(s"$tmp/aggregated_orders")
    assert(after.count() == firstCount + 3)
  }
}
