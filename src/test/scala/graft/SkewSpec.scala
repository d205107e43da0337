package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skew

class SkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // one hot key (90% of rows) + a long tail
  lazy val skewed = spark.range(10000).select(
    when($"id" % 10 =!= 0, lit(1L)).otherwise($"id").as("k"),
    lit(1L).as("v"))

  test("saltedAgg equals plain groupBy aggregation") {
    val plain = skewed.groupBy("k")
      .agg(sum("v").as("total"), count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val salted = Skew.saltedAgg(skewed, Seq("k"), saltBuckets = 8,
      partials = Map("total" -> sum(col("v")), "n" -> count(lit(1))),
      merge = Map("total" -> sum(col("total")), "n" -> sum(col("n"))))
      .collect().map(r => r.getAs[Long]("k")
        -> (r.getAs[Long]("total"), r.getAs[Long]("n"))).toMap
    assert(salted == plain)
  }

  test("saltedJoin equals plain join") {
    val dim = spark.range(100).select($"id".as("k"),
      concat(lit("name_"), $"id").as("name"))
    val plain = skewed.join(dim, Seq("k")).groupBy("k", "name")
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val salted = Skew.saltedJoin(skewed, dim, "k", saltBuckets = 8)
      .groupBy("k", "name").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(salted == plain)
  }
}
