package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming operators over the events table (SURVEY.md §7.2
  * north-star extension; the reference itself is batch-only, §2.7 — its
  * "real-time dashboards" are Metabase polls of batch tables).
  *
  * Everything here is expressed on an unbounded DataFrame: the same
  * transforms run identically on a batch frame (tested both ways). At
  * scale, watermarks bound the state store; the windowed aggregations
  * shuffle once on (window, key).
  */
object EventStreams {

  /** The events schema as the driver writes it, with `ts` as raw
    * TIMESTAMP(NANOS) read as long (see graft.sources.Tables.events). */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Streaming source over a directory of events parquet files. */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream.schema(rawSchema).parquet(dir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }

  /** Tumbling-window aggregation with watermark: count/sum per
    * (window, event_type). `windowLen` e.g. "1 hour". */
  def tumblingCounts(events: DataFrame, windowLen: String,
                     watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("sum_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Sliding-window aggregation (windowLen over slide). */
  def slidingCounts(events: DataFrame, windowLen: String, slide: String,
                    watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen, slide), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"))

  /** Streaming exactly-once-per-key dedup bounded by the watermark:
    * duplicate event_ids arriving within the watermark horizon are
    * dropped (state-store-backed `dropDuplicates`). */
  def dedupEvents(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Run a streaming frame to completion against a bounded source and
    * return the materialized result (memory sink; for tests/smoke). */
  def runToMemory(streaming: DataFrame, name: String,
                  outputMode: String = "update"): DataFrame = {
    val q = streaming.writeStream
      .format("memory").queryName(name).outputMode(outputMode).start()
    q.processAllAvailable()
    q.stop()
    streaming.sparkSession.table(name)
  }
}
