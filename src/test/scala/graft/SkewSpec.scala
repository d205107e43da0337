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

  // uniform left side over the same 100-key dim
  lazy val uniform = spark.range(10000).select(($"id" % 100).as("k"),
    lit(1L).as("v"))
  lazy val dim100 = spark.range(100).select($"id".as("k"),
    concat(lit("name_"), $"id").as("name"))

  private def multiset(df: org.apache.spark.sql.DataFrame) =
    df.groupBy("k", "name").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet

  test("autoJoin: the salted path is chosen on the skewed fixture and " +
    "its output equals the plain join") {
    val (joined, rep) = Skew.autoJoin(skewed, dim100, "k",
      broadcastRowLimit = 10) // dim100 too big to 'broadcast' here
    assert(rep.choice == "salted", rep)
    assert(rep.topKey.contains(1L) && rep.topContrib == 9000L, rep)
    assert(multiset(joined) == multiset(skewed.join(dim100, Seq("k"))))
  }

  test("autoJoin: plain on the uniform fixture (no dominant key), " +
    "same multiset") {
    val (joined, rep) = Skew.autoJoin(uniform, dim100, "k",
      broadcastRowLimit = 10)
    assert(rep.choice == "plain", rep)
    assert(multiset(joined) == multiset(uniform.join(dim100, Seq("k"))))
  }

  test("autoJoin: broadcast when the right side fits the row limit; " +
    "the plan really broadcasts") {
    val (joined, rep) = Skew.autoJoin(uniform, dim100, "k",
      broadcastRowLimit = 1000)
    assert(rep.choice == "broadcast", rep)
    assert(multiset(joined) == multiset(uniform.join(dim100, Seq("k"))))
    assert(joined.queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin"))
  }

  test("joinDiagnostics on STRING keys counts under the portable hash " +
    "instead of silently NULLing out (the long-cast degeneration)") {
    val a = Seq("x", "x", "y", "z").toDF("k")
    val b = Seq("x", "y", "y", "w").toDF("k")
    val d = Skew.joinDiagnostics(a, "k", b, "k").collect().head
    assert(d.getAs[Long]("n_a") == 4 && d.getAs[Long]("n_b") == 4)
    assert(d.getAs[Long]("ndv_a") == 3 && d.getAs[Long]("ndv_b") == 3)
    assert(d.getAs[Long]("n_matching_keys") == 2) // x and y
    assert(d.getAs[Long]("out_rows") == 4)        // 2·1 + 1·2
    assert(d.getAs[Long]("top_contrib") == 2)
  }

  test("reducedSemiJoin on STRING keys equals the plain semi-join " +
    "(hashed Bloom feed, no empty-result degeneration)") {
    val big = Seq.tabulate(500)(i => s"key_${i % 50}").toDF("k")
    val keys = Seq("key_3", "key_7", "key_11", "nope").toDF("k")
    val reduced = graft.operators.BloomJoin
      .reducedSemiJoin(big, "k", keys, "k")
      .collect().map(_.getString(0)).sorted.toSeq
    val plain = big.join(keys.distinct(), Seq("k"), "left_semi")
      .collect().map(_.getString(0)).sorted.toSeq
    assert(reduced == plain && reduced.size == 30)
  }

  test("fileBloomIndex refuses a non-integral key loudly") {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-bloomidx").toString + "/t"
    Seq(("a", 1L), ("b", 2L)).toDF("s", "k")
      .write.mode("overwrite").parquet(tmp)
    val e = intercept[IllegalArgumentException] {
      graft.operators.BloomJoin.fileBloomIndex(spark, tmp, "s")
    }
    assert(e.getMessage.contains("integral"))
    // the integral column still indexes fine
    assert(graft.operators.BloomJoin.fileBloomIndex(spark, tmp, "k")
      .count() >= 1)
  }
}
