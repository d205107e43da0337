package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables
import graft.streaming.EventStreams

/** Schema-drift canary for the driver-generated events testdata.
  *
  * Round 8 lost three components to a silent format change: the driver
  * regenerated `events.parquet` with `ts` as TIMESTAMP(MICROS)/NTZ where
  * the code assumed TIMESTAMP(NANOS)-read-as-long, and the streaming
  * reader compressed the whole event timeline 1000× without any error.
  * This spec makes the NEXT drift fail in one obvious place:
  *  - the batch accessor must present exactly one canonical type;
  *  - batch and streaming readers must decode the SAME file to byte-
  *    identical timestamps (min/max pinned);
  *  - the legacy long-nanos decode must stay correct (synthetic fixture);
  *  - an unknown encoding must fail loudly, never pass through.
  */
class EventSchemaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  test("batch accessor normalizes ts to TimestampType regardless of the " +
    "on-disk encoding") {
    assert(Tables.events(spark, dir).schema("ts").dataType == TimestampType)
  }

  test("streaming reader and batch accessor decode the same file to " +
    "identical timestamps (min/max/count pinned)") {
    val d = java.nio.file.Files.createTempDirectory("graft-canary")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      d.resolve("events.parquet"))
    def bounds(df: org.apache.spark.sql.DataFrame) = df
      .agg(min("ts").as("mn"), max("ts").as("mx"), count(lit(1)).as("n"))
    val streamed = EventStreams.runToMemory(
      bounds(EventStreams.readEvents(spark, d.toString)), "t_canary",
      outputMode = "complete").collect().head
    val batch = bounds(Tables.events(spark, dir)).collect().head
    assert(streamed.getTimestamp(0) == batch.getTimestamp(0),
      s"min ts: stream=${streamed.getTimestamp(0)} batch=${batch.getTimestamp(0)}")
    assert(streamed.getTimestamp(1) == batch.getTimestamp(1),
      s"max ts: stream=${streamed.getTimestamp(1)} batch=${batch.getTimestamp(1)}")
    assert(streamed.getLong(2) == batch.getLong(2))
  }

  test("legacy long-nanos fixture still decodes to the correct instants " +
    "(the nanos→micros branch is live, not dead code)") {
    val spark2 = spark
    import spark2.implicits._
    // 2026-03-01T00:00:00Z and one second later, as raw nanos
    val base = java.time.Instant.parse("2026-03-01T00:00:00Z").getEpochSecond
    val df = Seq(base * 1000000000L, (base + 1) * 1000000000L).toDF("ts")
    val got = Tables.normalizeTs(df)
    assert(got.schema("ts").dataType == TimestampType)
    val vals = got.orderBy("ts").collect().map(_.getTimestamp(0).getTime)
    assert(vals.toSeq == Seq(base * 1000L, (base + 1) * 1000L))
  }

  test("NTZ fixture decodes wall-clock-preserving under the UTC session") {
    val spark2 = spark
    import spark2.implicits._
    val base = java.time.Instant.parse("2026-03-01T00:00:00Z").getEpochSecond
    val df = Seq(java.time.LocalDateTime.ofEpochSecond(base, 0,
      java.time.ZoneOffset.UTC)).toDF("ts")
    assert(df.schema("ts").dataType == TimestampNTZType)
    val got = Tables.normalizeTs(df)
    assert(got.schema("ts").dataType == TimestampType)
    assert(got.collect().head.getTimestamp(0).getTime == base * 1000L)
    // and epoch arithmetic agrees with the oracle's epoch() semantics
    assert(got.select(col("ts").cast("long")).collect().head.getLong(0)
      == base)
  }

  test("an unknown ts encoding fails loudly instead of passing through") {
    val spark2 = spark
    import spark2.implicits._
    val e = intercept[IllegalArgumentException] {
      Tables.normalizeTs(Seq("2026-03-01").toDF("ts"))
    }
    assert(e.getMessage.contains("unsupported event-time encoding"))
  }
}
