package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.Scd

/** Streaming SCD2 maintenance: the dimension-side member of the
  * standing-artifact family (near-dup index — DocumentStreams, ANN
  * quantizer — EmbeddingStreams, inverted index / profile state — batch
  * q92/q95). Each micro-batch folds a slice of order events into the
  * standing SCD2 table via [[Scd.applyBatch]] — closed rows pass
  * through, history is never re-read.
  *
  * Exactly-once recipe: the standing table is VERSIONED by batch id.
  * Batch N reads version N-1 (its predecessor's committed state) and
  * overwrites version N. A replayed batch therefore folds into exactly
  * the state its first attempt saw — the crashed attempt's own v=N
  * write, committed or not, is ignored and rewritten to the same bytes
  * (applyBatch is deterministic), so at-least-once replay converges.
  * This is the read-side twin of DocumentStreams' own-ids anti-join:
  * there the batch subtracts its contribution from an append-only
  * index, here it simply never reads its own version.
  *
  * Contracts: batches must arrive key-time-ordered (every batch event
  * strictly later than every standing event for its key — a daily
  * slice; same contract as batch applyBatch), and version retention /
  * compaction of old `v=N` directories is the caller's policy knob,
  * like quantizer retraining cadence.
  */
object DimensionStreams {

  private def versionPath(dimDir: String, v: Long) = s"$dimDir/v=$v"

  /** One micro-batch of the streaming upsert (public so tests and any
    * foreachBatch caller run the exact same code path). */
  def upsertBatch(batch: DataFrame, batchId: Long, dimDir: String): Unit = {
    val spark = batch.sparkSession
    val prev = new org.apache.hadoop.fs.Path(versionPath(dimDir, batchId - 1))
    val fs = prev.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // the predecessor gate rides the committer's _SUCCESS marker (the
    // EmbeddingStreams bootstrap discipline): a partial v=N-1 means
    // batch N-1 itself will replay first
    val standing =
      if (fs.exists(new org.apache.hadoop.fs.Path(prev, "_SUCCESS")))
        spark.read.parquet(versionPath(dimDir, batchId - 1))
      else Scd.build(batch.limit(0)) // bootstrap: empty standing table
    Scd.applyBatch(standing, batch)
      .write.mode("overwrite").parquet(versionPath(dimDir, batchId))
  }

  /** Start the streaming SCD2 ingest over a stream of order events.
    * Pass a durable `checkpoint` for restart. */
  def ingestScd2(orders: DataFrame, dimDir: String, checkpoint: String):
      org.apache.spark.sql.streaming.StreamingQuery =
    orders.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
         batchId: Long) =>
          upsertBatch(batch.toDF(), batchId, dimDir)
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()

  /** Streaming MERGE INTO a [[graft.sources.VersionedTable]]: every
    * micro-batch lands as one transactional MERGE commit whose log
    * record carries the batch id, so a crash-replayed batch is a no-op
    * (VersionedTable.mergeBatch) — exactly-once table state from
    * at-least-once delivery, with every pre-merge version still
    * time-travel readable. This unifies the two r9 halves: the
    * versioned table's transactional MERGE and the streaming sinks'
    * batch-keyed idempotence (r9 verdict item 5).
    *
    * `deleteWhen` (over the SOURCE schema) flags rows to delete — the
    * streaming face of SCD-style retractions. */
  def ingestMerge(source: DataFrame, tableDir: String,
                  keys: Seq[String], checkpoint: String,
                  deleteWhen: Option[org.apache.spark.sql.Column] = None):
      org.apache.spark.sql.streaming.StreamingQuery =
    source.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
         batchId: Long) =>
          graft.sources.VersionedTable.mergeBatch(
            batch.sparkSession, tableDir, batch.toDF(), keys, batchId,
            deleteWhen)
          ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()

  /** The latest committed dimension version under `dimDir`. */
  def latestDim(spark: SparkSession, dimDir: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(dimDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val vs = fs.listStatus(p).map(_.getPath.getName)
      .filter(_.startsWith("v=")).map(_.drop(2).toLong)
    require(vs.nonEmpty, s"no committed dimension versions under $dimDir")
    spark.read.parquet(versionPath(dimDir, vs.max))
  }
}
