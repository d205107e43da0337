package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Procurement
import graft.sources.Tables

/** S2 federation, exercised against a REAL database: the master dims
  * round-trip through an embedded in-memory Derby instance (the JDBC
  * engine shipped in the Spark distribution) and the MRP net-demand query
  * runs over the JDBC-read dims — the Spark analogue of the reference's
  * Trino↔Postgres federation (reference:
  * docker/trino-conf/catalog/postgres.properties:1-6;
  * docker/dags/sql/net_demand.sql:37,62,74 joins hive facts to
  * postgres.public.products/suppliers/product_suppliers).
  *
  * Derby caps DECIMAL precision at 31, so unit_cost crosses as
  * DECIMAL(12,2) — both sides of the equality compare use that type.
  */
class JdbcSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  System.setProperty("derby.system.home",
    java.nio.file.Files.createTempDirectory("graft-derby").toString)

  val url = "jdbc:derby:memory:graftjdbc;create=true"
  val props = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")

  def fixtures: ProcurementSpec = new ProcurementSpec

  /** unit_cost at the wire type used for the Derby table. */
  def dims(ps: ProcurementSpec): (DataFrame, DataFrame, DataFrame) =
    (ps.products, ps.suppliers,
      ps.productSuppliers.withColumn("unit_cost",
        col("unit_cost").cast("decimal(12,2)")))

  def writeJdbc(df: DataFrame, table: String, colTypes: String = ""): Unit = {
    val w = df.write.format("jdbc").option("url", url)
      .option("dbtable", table)
      .option("driver", props("driver"))
      .mode("overwrite")
    (if (colTypes.nonEmpty) w.option("createTableColumnTypes", colTypes)
     else w).save()
  }

  test("S2: master dims survive a JDBC round-trip (schema + values)") {
    val ps = fixtures
    val (products, suppliers, productSuppliers) = dims(ps)
    writeJdbc(products, "products")
    writeJdbc(suppliers, "suppliers")
    writeJdbc(productSuppliers, "product_suppliers",
      "unit_cost DECIMAL(12,2)")

    for ((name, local) <- Seq("products" -> products,
        "suppliers" -> suppliers,
        "product_suppliers" -> productSuppliers)) {
      val back = Tables.jdbc(spark, url, name, props)
      assert(back.schema.fieldNames.toSeq == local.schema.fieldNames.toSeq,
        s"$name columns")
      assert(back.collect().map(_.toSeq.map(String.valueOf)).toSet ==
        local.collect().map(_.toSeq.map(String.valueOf)).toSet,
        s"$name values")
    }
  }

  test("S2: net demand over JDBC-federated dims equals the local-dim run") {
    val ps = fixtures
    val (products, suppliers, productSuppliers) = dims(ps)
    writeJdbc(products, "products")
    writeJdbc(suppliers, "suppliers")
    writeJdbc(productSuppliers, "product_suppliers",
      "unit_cost DECIMAL(12,2)")

    val viaJdbc = Procurement.netDemand(ps.orders, ps.inventory,
      Tables.jdbc(spark, url, "products", props),
      Tables.jdbc(spark, url, "suppliers", props),
      Tables.jdbc(spark, url, "product_suppliers", props), ps.d)
    val viaLocal = Procurement.netDemand(ps.orders, ps.inventory,
      products, suppliers, productSuppliers, ps.d)

    val j = viaJdbc.collect().map(_.toSeq.map(String.valueOf)).toSet
    val l = viaLocal.collect().map(_.toSeq.map(String.valueOf)).toSet
    assert(j == l && j.nonEmpty)
  }

  test("S2: dim predicates push down into the JDBC scan") {
    val ps = fixtures
    writeJdbc(dims(ps)._1, "products")
    val p = Tables.jdbc(spark, url, "products", props)
      .filter(col("is_active") && col("safety_stock_level") > 10)
      .queryExecution.executedPlan.toString
    // (the plan string truncates the filter list at 100 chars, so match
    // the filters that fit plus the truncated GreaterThan prefix)
    assert(p.contains("PushedFilters:") && p.contains("IsNotNull"), p)
    assert(p.contains("EqualTo(is_active,true)"), p)
    assert(p.contains("GreaterThan(sa"), p)
  }
}
