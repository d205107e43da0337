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

  test("typed analytics edges: quantiles, split assignments, and the " +
    "join-shape report expose field access over the same plans") {
    import spark.implicits._
    val vals = Seq(1.0, 2.0, 3.0, 4.0).map(Tuple1(_)).toDF("v")
    val qs = Typed.quantiles(vals, "v", Seq(50, 100)).collect()
      .map(q => q.p -> q.value).toMap
    assert(qs == Map(50L -> Some(2.0), 100L -> Some(4.0)))

    val docs = (1L to 10L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val clusters = Seq((1L, 1L), (2L, 1L)).toDF("id", "comp")
    val sp = Typed.leakageSafeSplit(docs, clusters).collect()
    assert(sp.length == 10)
    val byId = sp.map(s => s.doc_id -> s).toMap
    assert(byId(1L).split == byId(2L).split &&
      byId(1L).unit == 1L && byId(2L).unit == 1L)
    assert(sp.forall(s => Set("train", "val", "test")(s.split)))

    val shape = Typed.joinShape(
      Seq(1L, 1L, 2L).toDF("ka"), "ka", Seq(1L, 3L).toDF("kb"), "kb")
    assert(shape.n_a == 3 && shape.ndv_a == 2 && shape.out_rows == 2)
    assert(shape.top_key.contains(1L) && shape.top_contrib.contains(2L))
  }

  test("typed round-9 edges: ANN hits, BPE merges, and snapshot-diff " +
    "rows expose field access over the same plans") {
    import spark.implicits._
    val emb = graft.sources.Tables.load(spark, "/root/testdata/sf0.001",
      "embeddings")
    val hits = Typed.hnswTopK(emb,
      emb.filter(org.apache.spark.sql.functions.col("vec_id") === 0),
      k = 3, efSearch = 4096).collect()
    assert(hits.length == 3 && hits.forall(_.query_id == 0L)
      && hits.map(_.rank).sorted.toSeq == Seq(1, 2, 3)
      && hits.forall(h => h.sim <= 1.0 && h.sim >= -1.0))

    val docs = Seq((0L, "ab ab")).toDF("doc_id", "text")
    val ms = Typed.bpeMerges(docs, rounds = 4).collect()
    assert(ms.map(m => (m.round, m.lsym, m.rsym, m.n)).toSeq ==
      Seq((1L, "a", "b", 2L), (2L, "ab", "</w>", 2L)))

    val d = Typed.snapshotDiff(
      Seq((1L, "x")).toDF("doc_id", "text"),
      Seq((1L, "y"), (2L, "z")).toDF("doc_id", "text")).collect()
      .map(r => r.doc_id -> r).toMap
    assert(d(1L).status == "modified" && d(1L).fp_old.isDefined)
    assert(d(2L).status == "added" && d(2L).fp_old.isEmpty)
  }
}
