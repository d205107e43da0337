package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Procurement

/** Property-based invariants (SURVEY.md §5.4) over the MRP expression:
  * one Spark job evaluates the expression over a seeded random table; the
  * invariants are checked row-by-row against a Scala-side model.
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  case class In(totalOrdered: Option[Int], availableQty: Option[Int],
                reservedQty: Option[Int], safetyStock: Option[Int],
                safetyStockLevel: Int)

  val gen: Gen[In] = for {
    o <- Gen.option(Gen.chooseNum(0, 10000))
    av <- Gen.option(Gen.chooseNum(0, 10000))
    rv <- Gen.option(Gen.chooseNum(0, 10000))
    ss <- Gen.option(Gen.chooseNum(0, 500))
    ssl <- Gen.chooseNum(0, 500)
  } yield In(o, av, rv, ss, ssl)

  val cases: List[In] =
    Gen.listOfN(500, gen).apply(Gen.Parameters.default, Seed(42L)).get

  test("MRP expression == model: clamp, null-defaults, safety fallback") {
    val df = cases
      .map(c => (c.totalOrdered, c.availableQty, c.reservedQty,
        c.safetyStock, c.safetyStockLevel))
      .toDF("total_ordered", "available_qty", "reserved_qty",
        "safety_stock", "safety_stock_level")
      .withColumn("net_demand", Procurement.netDemandExpr)
    val got = df.collect()
    got.zip(cases).foreach { case (r, c) =>
      val expect = math.max(0L,
        c.totalOrdered.getOrElse(0).toLong
          + c.safetyStock.getOrElse(c.safetyStockLevel)
          - (c.availableQty.getOrElse(0).toLong - c.reservedQty.getOrElse(0)))
      val nd = r.getAs[Number]("net_demand").longValue
      assert(nd == expect, s"case $c")
      assert(nd >= 0)
    }
  }

  test("HLL sketch (approx_count_distinct) within 5% of exact on events") {
    val ev = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
    val r = ev.agg(
      countDistinct(col("user_id")).as("exact"),
      approx_count_distinct(col("user_id")).as("approx")).collect().head
    val exact = r.getLong(0).toDouble
    val approx = r.getLong(1).toDouble
    assert(math.abs(approx - exact) / exact < 0.05,
      s"approx=$approx exact=$exact")
  }

  test("decimal estimated_cost is exact net_demand × unit_cost") {
    val costs = Gen.listOfN(200, Gen.chooseNum(1, 999999))
      .apply(Gen.Parameters.default, Seed(7L)).get
    val rows = costs.zipWithIndex
      .map { case (c, i) => (i + 1L, BigDecimal(c) / 100) }
      .toDF("net_demand", "unit_cost")
      .withColumn("unit_cost",
        col("unit_cost").cast(org.apache.spark.sql.types.DecimalType(10, 2)))
      .withColumn("estimated_cost",
        (col("net_demand") * col("unit_cost"))
          .cast(org.apache.spark.sql.types.DecimalType(18, 2)))
      .collect()
    rows.foreach { r =>
      val expect = new java.math.BigDecimal(r.getAs[Long]("net_demand"))
        .multiply(r.getAs[java.math.BigDecimal]("unit_cost"))
      assert(r.getAs[java.math.BigDecimal]("estimated_cost")
        .compareTo(expect) == 0)
    }
  }
}
