package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Scd

/** Incremental SCD2 maintenance: applyBatch(standing, slice) must equal
  * build(full history) — checked on crafted edge cases and seeded random
  * logs. */
class ScdSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(d: String) = Timestamp.valueOf(s"$d 00:00:00")

  private def img(df: org.apache.spark.sql.DataFrame) =
    df.select("customer_id", "change_key", "status", "valid_from",
        "valid_to", "is_current")
      .collect().map(_.toSeq).toSet

  test("applyBatch ≡ full rebuild: untouched, continued, changed, " +
    "multi-change, and brand-new customers") {
    val hist = Seq(
      (1L, 10L, "A", ts("1996-01-01")), (1L, 11L, "A", ts("1996-02-01")),
      (2L, 20L, "A", ts("1996-01-05")), (2L, 21L, "B", ts("1996-03-01")),
      (3L, 30L, "C", ts("1996-06-01")),
      (5L, 50L, "A", ts("1996-04-01"))
    ).toDF("o_custkey", "o_orderkey", "o_orderstatus", "o_orderdate")
    val batch = Seq(
      (1L, 12L, "A", ts("1997-01-10")),               // continues: no row
      (2L, 22L, "A", ts("1997-02-01")),               // changes back
      (3L, 31L, "D", ts("1997-01-01")),               // changes
      (3L, 32L, "E", ts("1997-05-01")),               // changes again
      (4L, 40L, "X", ts("1997-03-01")),               // brand-new customer
      (4L, 41L, "X", ts("1997-04-01"))                // run-continuation
      // customer 5: no batch rows at all — passes through untouched
    ).toDF("o_custkey", "o_orderkey", "o_orderstatus", "o_orderdate")
    val applied = Scd.applyBatch(Scd.build(hist), batch)
    val rebuilt = Scd.build(hist.unionByName(batch))
    assert(img(applied) == img(rebuilt))
    // spot-check semantics: customer 1's single interval stays open
    val c1 = applied.filter(col("customer_id") === 1).collect()
    assert(c1.length == 1 && c1.head.getAs[Boolean]("is_current"))
    // customer 3 has three intervals, only the last open
    val c3 = applied.filter(col("customer_id") === 3)
      .orderBy("valid_from").collect()
    assert(c3.map(_.getAs[String]("status")).toSeq == Seq("C", "D", "E"))
    assert(c3.map(_.getAs[Boolean]("is_current")).toSeq ==
      Seq(false, false, true))
  }

  test("applyBatch ≡ full rebuild on seeded random logs") {
    val rng = new scala.util.Random(31)
    (1 to 4).foreach { trial =>
      val events = (1 to 120).map { i =>
        (rng.nextInt(8).toLong,            // customer
          (trial * 1000 + i).toLong,       // unique key, increasing
          ("ABC" (rng.nextInt(3))).toString,
          ts(f"199${6 + i / 60}%d-${1 + (i / 5) % 12}%02d-${1 + i % 28}%02d"))
      }
      // split on time so the batch-strictly-later contract holds
      val all = events.toDF("o_custkey", "o_orderkey", "o_orderstatus",
        "o_orderdate")
      val cut = ts("1997-06-01")
      val applied = Scd.applyBatch(
        Scd.build(all.filter(col("o_orderdate") < cut)),
        all.filter(col("o_orderdate") >= cut))
      assert(img(applied) == img(Scd.build(all)), s"trial $trial")
    }
  }
}
