package graft.api

import java.sql.Date
import java.time.LocalDate

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}

import graft.operators.{Procurement, Replay}

/** The typed `Dataset[T]` edge of the procurement surface (SURVEY.md §7:
  * "Dataset[T] at API edges, DataFrame internally"). The case classes
  * mirror the reference's Python dataclasses
  * (/root/reference/docker/dags/hdfs_upload_data_dag.py:47-84) and the
  * Postgres DDL (/root/reference/docker/init-scripts/ddl_postgres.sql);
  * the conversions are schema-CHECKED `.as[T]` casts over the Replay
  * frames, so a drifted column name or type is an analysis error at the
  * edge, not a runtime surprise downstream.
  *
  * Internally everything stays DataFrame: typed rows here are for
  * callers — compile-time field access, exhaustive-match refactors, and
  * encoder-backed collection to driver code — not for the engine, which
  * keeps whole-stage codegen and pushdowns by staying columnar.
  */
object Typed {

  final case class Order(order_id: Long, product_id: Long, quantity: Int,
                         status: String, order_date: Date)

  final case class InventorySnapshot(product_id: Long, available_qty: Int,
                                     reserved_qty: Int, safety_stock: Int,
                                     warehouse_id: Int, snapshot_date: Date)

  final case class Product(product_id: Long, product_name: String,
                           safety_stock_level: Int, is_active: Boolean)

  final case class Supplier(supplier_id: Long, supplier_name: String,
                            is_active: Boolean)

  final case class ProductSupplier(product_id: Long, supplier_id: Long,
                                   unit_cost: BigDecimal, priority: Int)

  /** One MRP output row (net_demand.sql's projection). */
  final case class NetDemandRow(product_id: Long, product_name: String,
                                supplier_id: Long, supplier_name: String,
                                net_demand: Long, unit_cost: BigDecimal,
                                estimated_cost: BigDecimal,
                                supplier_priority: Int)

  def orders(spark: SparkSession, dir: String): Dataset[Order] =
    Replay.orders(spark, dir).as(Encoders.product[Order])

  def inventory(spark: SparkSession,
                dir: String): Dataset[InventorySnapshot] =
    Replay.inventory(spark, dir).as(Encoders.product[InventorySnapshot])

  def products(spark: SparkSession, dir: String): Dataset[Product] =
    Replay.products(spark, dir).as(Encoders.product[Product])

  def suppliers(spark: SparkSession, dir: String): Dataset[Supplier] =
    Replay.suppliers(spark, dir).as(Encoders.product[Supplier])

  def productSuppliers(spark: SparkSession,
                       dir: String): Dataset[ProductSupplier] =
    Replay.productSuppliers(spark, dir)
      .as(Encoders.product[ProductSupplier])

  /** The MRP flagship with a typed result — the DataFrame plan is
    * IDENTICAL to the q03 one (the `.as` is a lazy cast at the edge);
    * only the caller-facing element type changes. */
  def netDemand(spark: SparkSession, dir: String,
                from: LocalDate, until: LocalDate): Dataset[NetDemandRow] = {
    import org.apache.spark.sql.functions.col
    def o(d: LocalDate): Date = Date.valueOf(d)
    Procurement.netDemand(
        Replay.orders(spark, dir), Replay.inventory(spark, dir),
        Replay.products(spark, dir), Replay.suppliers(spark, dir),
        Replay.productSuppliers(spark, dir),
        col("order_date") >= o(from) && col("order_date") < o(until),
        col("snapshot_date") >= o(from.minusYears(1))
          && col("snapshot_date") < o(until.minusYears(1)))
      .as(Encoders.product[NetDemandRow])
  }

  // --- typed edges of the round-7 analytics operators ---------------------

  /** One exact-quantile result row (Sketches.bisectQuantiles); `value`
    * is None only for an empty input. */
  final case class QuantileRow(p: Long, rk: Long, n: Long,
                               value: Option[Double])

  /** One leakage-safe split assignment (Dedup.leakageSafeSplit). */
  final case class SplitAssignment(doc_id: Long, unit: Long, bucket: Long,
                                   split: String)

  /** The one-row join-shape report (Skew.joinDiagnostics); top fields
    * are None when the key sets are disjoint. */
  final case class JoinShape(n_a: Long, ndv_a: Long, n_b: Long,
                             ndv_b: Long, n_matching_keys: Long,
                             out_rows: Long, top_key: Option[Long],
                             top_contrib: Option[Long])

  def quantiles(df: org.apache.spark.sql.DataFrame, valueCol: String,
                percentiles: Seq[Int]): Dataset[QuantileRow] =
    graft.functions.Sketches.bisectQuantiles(df, valueCol, percentiles)
      .as(Encoders.product[QuantileRow])

  def leakageSafeSplit(docs: org.apache.spark.sql.DataFrame,
                       clusters: org.apache.spark.sql.DataFrame)
      : Dataset[SplitAssignment] =
    graft.functions.Dedup.leakageSafeSplit(docs, clusters)
      .as(Encoders.product[SplitAssignment])

  /** Join-shape report collected to a typed value — the intended use:
    * driver code branches on exact numbers (salt or not, broadcast or
    * not) before composing the join. */
  def joinShape(a: org.apache.spark.sql.DataFrame, aKey: String,
                b: org.apache.spark.sql.DataFrame,
                bKey: String): JoinShape =
    graft.operators.Skew.joinDiagnostics(a, aKey, b, bKey)
      .as(Encoders.product[JoinShape])
      .collect().head

  /** One ANN search hit (Hnsw.searchIndex / topK). */
  final case class AnnHit(query_id: Long, vec_id: Long, sim: Double,
                          rank: Int)

  /** One learned BPE merge (Bpe.merges). */
  final case class BpeMerge(round: Long, lsym: String, rsym: String,
                            n: Long)

  /** One snapshot-diff row (Dedup.snapshotDiff); a fingerprint is None
    * on the side the id is absent from. */
  final case class DiffRow(doc_id: Long, status: String,
                           fp_old: Option[String], fp_new: Option[String])

  def hnswTopK(corpus: org.apache.spark.sql.DataFrame,
               queries: org.apache.spark.sql.DataFrame, k: Int,
               efSearch: Int = 64): Dataset[AnnHit] =
    graft.functions.Hnsw.topK(corpus, queries, k, efSearch = efSearch)
      .as(Encoders.product[AnnHit])

  def bpeMerges(docs: org.apache.spark.sql.DataFrame,
                rounds: Int): Dataset[BpeMerge] =
    graft.functions.Bpe.merges(docs, rounds)
      .as(Encoders.product[BpeMerge])

  def snapshotDiff(oldSnap: org.apache.spark.sql.DataFrame,
                   newSnap: org.apache.spark.sql.DataFrame)
      : Dataset[DiffRow] =
    graft.functions.Dedup.snapshotDiff(oldSnap, newSnap)
      .as(Encoders.product[DiffRow])
}
