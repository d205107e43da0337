package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.api.Typed

/** The typed Dataset edge: schema-checked casts over the Replay frames,
  * identical plans/values to the DataFrame surface. */
class TypedSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  test("typed dims/facts round-trip with field access, matching the " +
    "DataFrame row counts") {
    val o = Typed.orders(spark, dir)
    assert(o.count() == graft.operators.Replay.orders(spark, dir).count())
    val one = o.head()
    assert(one.quantity >= 1 && one.product_id >= 0 && one.status.nonEmpty)
    val ps = Typed.productSuppliers(spark, dir).head()
    assert(ps.priority >= 1 && ps.priority <= 5
      && ps.unit_cost.signum > 0)
    val inactive = Typed.products(spark, dir).filter(p => !p.is_active)
    assert(inactive.count() > 0) // typed lambda filter works on the dim
  }

  test("typed netDemand ≡ the DataFrame flagship, value for value") {
    import java.time.LocalDate
    val from = LocalDate.parse(graft.operators.Replay.ordersFrom)
    val until = LocalDate.parse(graft.operators.Replay.ordersTo)
    val typed = Typed.netDemand(spark, dir, from, until)
    val df = graft.operators.Procurement.netDemand(
      graft.operators.Replay.orders(spark, dir),
      graft.operators.Replay.inventory(spark, dir),
      graft.operators.Replay.products(spark, dir),
      graft.operators.Replay.suppliers(spark, dir),
      graft.operators.Replay.productSuppliers(spark, dir),
      graft.operators.Replay.ordersWhen,
      graft.operators.Replay.inventoryWhen)
    val t = typed.collect()
    assert(t.length == df.count().toInt && t.nonEmpty)
    val byKey = df.collect().map(r =>
      (r.getAs[Number]("product_id").longValue,
        r.getAs[Number]("supplier_id").longValue) ->
        (r.getAs[Number]("net_demand").longValue,
          r.getAs[java.math.BigDecimal]("estimated_cost"))).toMap
    t.foreach { row =>
      val (nd, cost) = byKey((row.product_id, row.supplier_id))
      assert(row.net_demand == nd)
      assert(BigDecimal(cost).compare(row.estimated_cost) == 0)
    }
  }
}
