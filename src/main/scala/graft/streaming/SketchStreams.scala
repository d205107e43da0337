package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.functions.Sketches

/** Streaming heavy-hitter maintenance: the sketch-side member of the
  * versioned standing-artifact family (index — IndexStreams, dimension
  * — DimensionStreams). Each micro-batch builds its own Misra-Gries
  * state (freqState over just the batch) and folds it into the standing
  * state with the PODS-2012 merge — state-sized work per batch, the
  * event history is never re-read. Below capacity the state is exact at
  * every version; beyond it each version carries the merged-summary
  * bound.
  *
  * Exactly-once: the DimensionStreams recipe verbatim — batch N reads
  * committed v=N−1 (gated on `_SUCCESS`), overwrites v=N; replay folds
  * into the same predecessor state and rewrites the same bytes.
  */
object SketchStreams {

  private def versionPath(stateDir: String, v: Long) = s"$stateDir/v=$v"

  /** One micro-batch of the heavy-hitter merge (public so tests and any
    * foreachBatch caller run the exact same code path). */
  def hhBatch(batch: DataFrame, batchId: Long, stateDir: String, k: Int,
              groupCol: String, itemCol: String): Unit = {
    val spark = batch.sparkSession
    val batchState = Sketches.freqState(batch, groupCol, itemCol, k)
    val prev = new org.apache.hadoop.fs.Path(versionPath(stateDir,
      batchId - 1))
    val fs = prev.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val standing =
      if (fs.exists(new org.apache.hadoop.fs.Path(prev, "_SUCCESS")))
        spark.read.parquet(versionPath(stateDir, batchId - 1))
      else batchState.limit(0)
    Sketches.mergeFreqStates(standing, batchState, k, groupCol)
      .write.mode("overwrite").parquet(versionPath(stateDir, batchId))
  }

  /** Start the streaming heavy-hitter maintainer. Pass a durable
    * `checkpoint` for restart. */
  def ingestHeavyHitters(rows: DataFrame, stateDir: String,
                         checkpoint: String, k: Int, groupCol: String,
                         itemCol: String):
      org.apache.spark.sql.streaming.StreamingQuery =
    rows.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
         batchId: Long) =>
          hhBatch(batch.toDF(), batchId, stateDir, k, groupCol, itemCol)
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()

  /** The latest committed heavy-hitter state under `stateDir`. */
  def latestState(spark: SparkSession, stateDir: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(stateDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val vs = fs.listStatus(p).map(_.getPath.getName)
      .filter(_.startsWith("v=")).map(_.drop(2).toLong)
    require(vs.nonEmpty, s"no committed sketch versions under $stateDir")
    spark.read.parquet(versionPath(stateDir, vs.max))
  }

  /** One micro-batch of the Count-Min merge — the point-frequency
    * member of the streaming sketch family. Unlike Misra-Gries, the
    * Count-Min state is EXACT deterministic cell counts, so folding a
    * batch in is plain count addition (Sketches.mergeCountMin) and
    * every version's point estimates equal a one-shot sketch over
    * everything streamed so far. */
  def cmBatch(batch: DataFrame, batchId: Long, stateDir: String,
              itemCol: String, width: Int, depth: Int): Unit = {
    val spark = batch.sparkSession
    val batchState = Sketches.countMin(batch, itemCol, width, depth)
    val prev = new org.apache.hadoop.fs.Path(versionPath(stateDir,
      batchId - 1))
    val fs = prev.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val standing =
      if (fs.exists(new org.apache.hadoop.fs.Path(prev, "_SUCCESS")))
        spark.read.parquet(versionPath(stateDir, batchId - 1))
      else batchState.limit(0)
    Sketches.mergeCountMin(standing, batchState)
      .write.mode("overwrite").parquet(versionPath(stateDir, batchId))
  }

  /** Start the streaming Count-Min maintainer. */
  def ingestCountMin(rows: DataFrame, stateDir: String,
                     checkpoint: String, itemCol: String, width: Int,
                     depth: Int):
      org.apache.spark.sql.streaming.StreamingQuery =
    rows.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
         batchId: Long) =>
          cmBatch(batch.toDF(), batchId, stateDir, itemCol, width, depth)
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()

  /** Fold one batch's HyperLogLog registers into the standing table
    * (Sketches.hllRegisters / mergeHll — elementwise max, so unlike
    * Count-Min a REPLAYED batch is harmless even without the version
    * guard; the guard still makes the fold exactly-once). The standing
    * artifact answers corpus-wide distinct-count queries from ≤ 2^p
    * rows per group without rescanning history. */
  def hllBatch(batch: DataFrame, batchId: Long, stateDir: String,
               groupCol: String, valueCol: String, p: Int): Unit = {
    val spark = batch.sparkSession
    val batchState = Sketches.hllRegisters(batch, groupCol, valueCol, p)
    val prev = new org.apache.hadoop.fs.Path(versionPath(stateDir,
      batchId - 1))
    val fs = prev.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val standing =
      if (fs.exists(new org.apache.hadoop.fs.Path(prev, "_SUCCESS")))
        spark.read.parquet(versionPath(stateDir, batchId - 1))
      else batchState.limit(0)
    Sketches.mergeHll(standing, batchState, groupCol)
      .write.mode("overwrite").parquet(versionPath(stateDir, batchId))
  }

  /** Start the streaming HyperLogLog maintainer. */
  def ingestHll(rows: DataFrame, stateDir: String, checkpoint: String,
                groupCol: String, valueCol: String, p: Int = 9):
      org.apache.spark.sql.streaming.StreamingQuery =
    rows.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
         batchId: Long) =>
          hllBatch(batch.toDF(), batchId, stateDir, groupCol, valueCol, p)
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
}
