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

  test("S2: DECIMAL(10,2) round-trips at the reference's exact wire " +
    "type with boundary values (ddl_postgres.sql:13,29,38)") {
    val spark2 = spark
    import spark2.implicits._
    // 8-digit integral max, cents precision, negative adjustment, zero
    val rows = Seq(
      (1L, BigDecimal("99999999.99")),
      (2L, BigDecimal("0.01")),
      (3L, BigDecimal("-42.50")),
      (4L, BigDecimal("0.00")))
    val local = rows.toDF("id", "unit_cost")
      .withColumn("unit_cost", col("unit_cost").cast("decimal(10,2)"))
    writeJdbc(local, "dec_roundtrip", "unit_cost DECIMAL(10,2)")
    val back = Tables.jdbc(spark, url, "dec_roundtrip", props)
    // exact type: precision AND scale survive the wire
    val f = back.schema("unit_cost").dataType
    assert(f == org.apache.spark.sql.types.DecimalType(10, 2), f)
    // exact values as BigDecimal, not string-coerced
    val got = back.collect()
      .map(r => r.getLong(0) -> r.getDecimal(1)).toMap
    rows.foreach { case (id, bd) =>
      assert(got(id).compareTo(bd.underlying) == 0, s"id=$id got=${got(id)}")
    }
    // and DECIMAL aggregation over the JDBC scan keeps exact cents
    val s = back.agg(sum(col("unit_cost"))).collect()(0).getDecimal(0)
    assert(s.compareTo(rows.map(_._2).sum.underlying) == 0, s)
  }

  test("S2: partitionColumn parallel scan reads the same rows as the " +
    "single-partition scan (the big-table federation path)") {
    val ps = fixtures
    val (products, _, _) = dims(ps)
    writeJdbc(products, "products_par")
    val par = Tables.jdbc(spark, url, "products_par", props ++ Map(
      "partitionColumn" -> "product_id",
      "lowerBound" -> "1", "upperBound" -> "1000",
      "numPartitions" -> "4"))
    assert(par.rdd.getNumPartitions == 4)
    val single = Tables.jdbc(spark, url, "products_par", props)
    assert(par.collect().map(_.toSeq.map(String.valueOf)).toSet ==
      single.collect().map(_.toSeq.map(String.valueOf)).toSet)
    // rows outside [lowerBound, upperBound) still arrive (bounds stripe
    // partitions, they are NOT a filter) — the classic federation trap
    assert(par.count() == single.count())
  }

  test("S2: Spark's PostgresDialect maps the reference DDL types to the " +
    "Catalyst types this pipeline expects (offline contract — no PG " +
    "server in the container)") {
    import org.apache.spark.sql.types._
    val d = org.apache.spark.sql.jdbc.JdbcDialects
      .get("jdbc:postgresql://host/db")
    // engine-side → PG DDL: the types an INSERT INTO ... SELECT would
    // create on the production edge. A None defers to Spark's common
    // mapping (NUMERIC(10,2) / BOOLEAN / INTEGER / TIMESTAMP — already
    // correct for these); a Some must be the PG-specific spelling.
    def ddlOf(t: DataType): Option[String] =
      d.getJDBCType(t).map(_.databaseTypeDefinition.toUpperCase)
    ddlOf(DecimalType(10, 2)).foreach(s =>
      assert(s.contains("NUMERIC(10,2)") || s.contains("DECIMAL(10,2)"), s))
    ddlOf(BooleanType).foreach(s => assert(s.startsWith("BOOLEAN"), s))
    ddlOf(IntegerType).foreach(s => assert(s.contains("INT"), s))
    // PG-dialect-specific spellings Spark MUST override (the common
    // mapping would be wrong on PG): no BYTE/REAL confusion
    assert(ddlOf(FloatType).contains("FLOAT4"))
    assert(ddlOf(ByteType).exists(s => s == "SMALLINT" || s == "INT2"))
    // PG → Catalyst: NUMERIC(10,2) arrives as DecimalType(10,2) — the
    // schema the net-demand DECIMAL math expects
    val md = new MetadataBuilder().putLong("scale", 2)
    val dec = d.getCatalystType(java.sql.Types.NUMERIC, "numeric", 10, md)
    dec.foreach(t => assert(t == DecimalType(10, 2), t))
    // and the dialect quotes identifiers the PG way (lowercase folding
    // means quoted mixed-case columns must round-trip quoted)
    assert(d.quoteIdentifier("unit_cost") == "\"unit_cost\"")
  }
}
