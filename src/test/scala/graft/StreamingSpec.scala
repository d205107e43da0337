package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStreams

/** Structured Streaming over the driver's events table: the streaming
  * plans must produce the same aggregates as their batch twins
  * (q25/q26 semantics) when driven to completion on a bounded source.
  */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  val dir = "/root/testdata/sf0.001"

  /** FileStreamSource needs a directory: stage the single parquet file. */
  lazy val streamDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-events")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      d.resolve("events.parquet"))
    d.toString
  }

  test("tumbling window streaming agg matches batch groupBy") {
    val stream = EventStreams.readEvents(spark, streamDir)
    val got = EventStreams.runToMemory(
      EventStreams.tumblingCounts(stream, "1 hour"), "t_tumbling")
    val batch = graft.sources.Tables.events(spark, dir)
      .groupBy(org.apache.spark.sql.functions.date_trunc("hour",
        org.apache.spark.sql.functions.col("ts")),
        org.apache.spark.sql.functions.col("event_type"))
      .count()
    assert(got.count() == batch.count())
    val totalStream = got.agg(org.apache.spark.sql.functions.sum("n_events"))
      .collect().head.getLong(0)
    assert(totalStream == 1000)
  }

  test("sliding window emits two windows per event") {
    val stream = EventStreams.readEvents(spark, streamDir)
    val got = EventStreams.runToMemory(
      EventStreams.slidingCounts(stream, "1 hour", "30 minutes"), "t_sliding")
    val total = got.agg(org.apache.spark.sql.functions.sum("n_events"))
      .collect().head.getLong(0)
    assert(total == 2000)
  }

  test("streaming dedup drops duplicate event_ids") {
    val stream = EventStreams.readEvents(spark, streamDir)
    val doubled = stream.union(stream)
    val got = EventStreams.runToMemory(
      EventStreams.dedupEvents(doubled), "t_dedup", outputMode = "append")
    assert(got.count() == 1000)
  }
}
