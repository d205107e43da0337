package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Similarity

/** Streaming ANN ingestion: the embeddings-side twin of
  * DocumentStreams.ingestNearDups — exactly-once micro-batch landing
  * composed with the standing-quantizer assignment
  * (Similarity.incrementalAssign). Each micro-batch:
  *
  *   1. bootstrap: if no standing centroid table exists yet, TRAIN it on
  *      this (first) batch and write it — training is deterministic
  *      (first-k seed + Lloyd), so a crash-replay of the bootstrap batch
  *      retrains byte-identical centroids and the overwrite converges;
  *   2. assigns the batch map-side against the broadcast k-row table —
  *      O(batch) per micro-batch, no historical vector is ever rescanned;
  *   3. lands (vec_id, cell) under `out/batch_id=N` (overwrite — the
  *      idempotent at-least-once → exactly-once recipe).
  *
  * Retraining cadence is deliberately OUTSIDE the stream (drop the
  * centroid table and replay, or swap in a refreshed table between
  * runs): a quantizer that silently retrains mid-stream would reassign
  * history, which is a batch job, not a streaming side effect.
  */
object EmbeddingStreams {

  /** One micro-batch of the streaming assignment (public so tests and
    * any foreachBatch caller run the exact same code path). */
  def assignBatch(batch: DataFrame, batchId: Long, indexDir: String,
                  outPath: String, k: Int, lloydIters: Int): Unit = {
    val spark = batch.sparkSession
    val vecs = batch.select(col("vec_id"), col("embedding"))
    val centPath = s"$indexDir/centroids"
    val p = new org.apache.hadoop.fs.Path(centPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // gate on the committer's _SUCCESS marker, not the bare directory: a
    // crash mid-write leaves a partial directory that would pass a
    // directory-exists check on replay and feed a corrupt or empty
    // quantizer; an uncommitted directory retrains (overwrite converges)
    if (!fs.exists(new org.apache.hadoop.fs.Path(p, "_SUCCESS")))
      Similarity.centroids(vecs, k, lloydIters)
        .write.mode("overwrite").parquet(centPath)
    val cents = spark.read.parquet(centPath)
    // fail fast on a short quantizer (e.g. a bootstrap batch with fewer
    // than k vectors trains fewer centroids) instead of silently
    // assigning against the wrong-k table
    val nCents = cents.count()
    require(nCents == k,
      s"standing quantizer at $centPath has $nCents centroids, expected " +
        s"$k — bootstrap with at least k vectors or remove the directory")
    Similarity.incrementalAssign(cents, vecs)
      .write.mode("overwrite").parquet(s"$outPath/batch_id=$batchId")
  }

  /** Start the streaming assignment ingest. Pass a durable `checkpoint`
    * for restart. */
  def ingestAssignments(vecs: DataFrame, indexDir: String, outPath: String,
                        checkpoint: String, k: Int = 8,
                        lloydIters: Int = 1):
      org.apache.spark.sql.streaming.StreamingQuery =
    vecs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
         batchId: Long) =>
          assignBatch(batch.toDF(), batchId, indexDir, outPath, k,
            lloydIters)
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
}
