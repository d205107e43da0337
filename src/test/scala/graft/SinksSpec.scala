package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Sinks

class SinksSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bucketed tables join without any Exchange (co-located SMJ)") {
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_buckets")
    val a = spark.range(10000).select($"id".as("k"), ($"id" * 2).as("va"))
    val b = spark.range(10000).select($"id".as("k"), ($"id" * 3).as("vb"))
    Sinks.writeBucketed(a, "graft_buckets.ta", Seq("k"), 8, Seq("k"))
    Sinks.writeBucketed(b, "graft_buckets.tb", Seq("k"), 8, Seq("k"))
    // disable auto-broadcast so the join would otherwise need a shuffle
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("graft_buckets.ta")
        .join(spark.table("graft_buckets.tb"), Seq("k"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(1500))
      assert(!plan.contains("Exchange"), plan.take(1500))
      assert(joined.count() == 10000)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE graft_buckets.ta")
      spark.sql("DROP TABLE graft_buckets.tb")
      spark.sql("DROP DATABASE graft_buckets")
    }
  }

  test("bucketed replay facts: the net-demand pre-aggregation join runs " +
    "with ZERO exchanges (shuffle paid once at write time)") {
    import graft.operators.{Procurement, Replay}
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_replay")
    val dir = "/root/testdata/sf0.001"
    Sinks.writeBucketed(Replay.orders(spark, dir),
      "graft_replay.orders_b", Seq("product_id"), 8, Seq("product_id"))
    Sinks.writeBucketed(Replay.inventory(spark, dir),
      "graft_replay.inventory_b", Seq("product_id"), 8, Seq("product_id"))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // both fact-side aggregations group on the bucket key, so the
      // bucketed scan's HashPartitioning(product_id) satisfies every
      // downstream distribution — aggregation AND join shuffle-free
      val joined = Procurement.dailyOrders(
          spark.table("graft_replay.orders_b"), Replay.ordersWhen)
        .join(Procurement.aggregatedInventory(
          spark.table("graft_replay.inventory_b"), Replay.inventoryWhen),
          Seq("product_id"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan.take(2000))
      assert(joined.count() > 0)
      // cross-check values against the unbucketed path
      val viaBucket = joined.select("product_id", "total_ordered",
        "available_qty").collect().map(_.toSeq).sortBy(_.toString)
      val direct = Procurement.dailyOrders(
          Replay.orders(spark, dir), Replay.ordersWhen)
        .join(Procurement.aggregatedInventory(
          Replay.inventory(spark, dir), Replay.inventoryWhen),
          Seq("product_id"))
        .select("product_id", "total_ordered", "available_qty")
        .collect().map(_.toSeq).sortBy(_.toString)
      assert(viaBucket.sameElements(direct))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE graft_replay.orders_b")
      spark.sql("DROP TABLE graft_replay.inventory_b")
      spark.sql("DROP DATABASE graft_replay")
    }
  }

  test("archive moves a directory via the Hadoop FS API (S11)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-arch").toString
    spark.range(10).write.parquet(s"$tmp/src/day1")
    assert(Sinks.archive(spark, s"$tmp/src/day1", s"$tmp/processed/day1"))
    assert(!new java.io.File(s"$tmp/src/day1").exists())
    assert(spark.read.parquet(s"$tmp/processed/day1").count() == 10)
    // missing source → false, no throw (reference logs and continues)
    assert(!Sinks.archive(spark, s"$tmp/src/nope", s"$tmp/processed/nope"))
  }

  test("compact rewrites a fragmented directory into target-sized files") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-compact").toString
    val dir = s"$tmp/frag"
    // 64 tiny files
    spark.range(100000).repartition(64).write.parquet(dir)
    val before = new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(before == 64)
    Sinks.compact(spark, dir, targetFileBytes = 512L * 1024)
    val after = new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(after < before)
    assert(spark.read.parquet(dir).count() == 100000)
  }

  test("compact with partitionCols preserves the Hive partition layout " +
    "and the data") {
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory("graft-pcomp").toString
    val dir = s"$tmp/days"
    spark.range(30000)
      .withColumn("day", (col("id") % 3).cast("int"))
      .repartition(16) // each task writes into every partition → 48 files
      .write.partitionBy("day").parquet(dir)
    def dayDirs = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("day=")).sortBy(_.getName)
    val filesBefore = dayDirs.map(_.listFiles()
      .count(_.getName.endsWith(".parquet"))).sum
    assert(dayDirs.length == 3 && filesBefore > 3)
    Sinks.compact(spark, dir, partitionCols = Seq("day"))
    assert(dayDirs.length == 3, "partition directories lost")
    val filesAfter = dayDirs.map(_.listFiles()
      .count(_.getName.endsWith(".parquet"))).sum
    assert(filesAfter < filesBefore)
    val back = spark.read.parquet(dir)
    assert(back.count() == 30000)
    assert(back.groupBy("day").count().collect()
      .forall(_.getLong(1) == 10000))
  }
}
