package graft

import org.scalatest.funsuite.AnyFunSuite

/** The native expression surface exposed to SQL users via
  * GraftSession.registerFunctions / GraftExtensions. */
class SqlFunctionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("cosine_similarity callable from SQL; codegen and eval agree") {
    GraftSession.registerFunctions(spark)
    val r = spark.sql(
      """SELECT cosine_similarity(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS s1,
        |       cosine_similarity(array(1.0d, 0.0d), array(0.0d, 1.0d)) AS s2,
        |       cosine_similarity(array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT)),
        |                         array(3.0d, 4.0d)) AS s3
        |""".stripMargin).collect().head
    assert(r.getDouble(0) == 1.0)
    assert(r.getDouble(1) == 0.0)
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-12)
  }

  test("null array input yields null") {
    GraftSession.registerFunctions(spark)
    val r = spark.sql(
      "SELECT cosine_similarity(CAST(NULL AS ARRAY<DOUBLE>), array(1.0d))")
      .collect().head
    assert(r.isNullAt(0))
  }
}
