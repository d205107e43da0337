package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Pii

class PiiSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs(texts: (Long, String)*) =
    texts.toDF("doc_id", "text")

  test("scan counts each pattern family on hand-built strings") {
    val d = docs(
      1L -> "mail me at a.b+c@sub.example.org or ops@ex.io thanks",
      2L -> "hosts 10.0.0.1 and 192.168.255.7, port 8080",
      3L -> "call (415) 555-0199 or 415-555-0123 or 415.555.0111",
      4L -> "no pii here, just 3.14 and v1.2.3 and a@b",
      5L -> "mixed: x@y.zz from 8.8.8.8 dialed 800 555 1234")
    val r = Pii.scan(d).collect()
      .map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3), x.getBoolean(4))))
      .toMap
    assert(r(1L) == ((2L, 0L, 0L, true)))
    assert(r(2L) == ((0L, 2L, 0L, true)))
    assert(r(3L) == ((0L, 0L, 3L, true)))
    // 3.14 / v1.2.3 are not dotted quads; a@b has no TLD
    assert(r(4L) == ((0L, 0L, 0L, false)))
    assert(r(5L) == ((1L, 1L, 1L, true)))
  }

  test("redact scrubs every match, leaves zero residuals, and is idempotent") {
    val d = docs(
      1L -> "a.b@x.org met 10.1.2.3 then phoned 650-555-8888 twice: 650-555-8888",
      2L -> "clean text stays byte-identical")
    val once = Pii.redact(d)
    val r = once.collect().map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(r(1L) ==
      "<EMAIL> met <IP> then phoned <PHONE> twice: <PHONE>")
    assert(r(2L) == "clean text stays byte-identical")
    // no residual matches after redaction
    val residual = Pii.scan(once.withColumnRenamed("redacted", "text"))
      .filter($"has_pii").count()
    assert(residual == 0L)
    // idempotent: a second pass is the identity
    val twice = Pii.redact(once.withColumnRenamed("redacted", "text"))
      .collect().map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(twice == r)
  }

  test("synthetic traffic: Scala builder and SQL builder agree; scan finds it") {
    val base = docs(0L -> "alpha", 5L -> "bravo", 7L -> "charlie",
      11L -> "delta", 35L -> "echo", 77L -> "foxtrot", 385L -> "golf")
    val enriched = Pii.withSyntheticPii(base)
    base.createOrReplaceTempView("pii_base")
    val viaSql = spark.sql(
      s"SELECT doc_id, ${Pii.syntheticPiiSql()} AS text FROM pii_base")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val viaScala = enriched.collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(viaScala == viaSql)
    // 385 = 5·7·11 → all three injected and found
    val s = Pii.scan(enriched).collect()
      .map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3)))).toMap
    assert(s(385L) == ((1L, 1L, 1L)))
    assert(s(0L) == ((1L, 1L, 1L)))   // 0 divisible by all moduli
    assert(s(5L) == ((1L, 0L, 0L)))
    assert(s(7L) == ((0L, 1L, 0L)))
    assert(s(11L) == ((0L, 0L, 1L)))
    assert(s(77L) == ((0L, 1L, 1L)))
  }

  test("redaction plan is map-side: no exchange below the scan") {
    val d = docs(1L -> "x@y.zz")
    val plan = Pii.redact(d).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"PII redaction must not shuffle:\n$plan")
  }
}
