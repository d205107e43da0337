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
    // fan = false: a micro-batch is small by contract — the parallelism
    // floor's exchange costs more than the batch's hash kernel saves
    // (measured r19: q250 1.92 s -> 2.62 s isolated with the fan on)
    val batchState = Sketches.countMin(batch, itemCol, width, depth,
      fan = false)
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

  /** Fold one batch into the standing CO-OCCURRENCE state (the q206
    * market-basket table maintained incrementally). The state is a PAIR
    * of frames under one version: `ut/` — distinct (user, type)
    * memberships seen so far — and `pc/` — unordered type-pair counts at
    * the user grain. A batch contributes only the memberships it is
    * FIRST to introduce (anti-join against standing `ut`), and new
    * pairs are exactly (new membership) × (full membership of the same
    * user), with new×new pairs kept once via a type-order guard — so
    * folding every batch reproduces the one-shot distinct-pair counts
    * regardless of how events split across batches or how often a
    * (user, type) repeats. Per-batch work is O(batch × per-user types):
    * the bounded type domain makes the join volume users·types² at
    * worst, never events².
    *
    * Exactly-once: the DimensionStreams recipe — batch N reads committed
    * v=N−1 (gated on `_SUCCESS`), overwrites v=N. */
  def cooccurBatch(batch: DataFrame, batchId: Long,
                   stateDir: String, userCol: String = "user_id",
                   typeCol: String = "event_type"): Unit = {
    import org.apache.spark.sql.functions._
    val spark = batch.sparkSession
    val batchUt = batch.select(col(userCol).as("user_id"),
      col(typeCol).as("event_type")).distinct()
    val prevUt = new org.apache.hadoop.fs.Path(
      s"${versionPath(stateDir, batchId - 1)}/ut")
    val fs = prevUt.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bootstrapped = fs.exists(
      new org.apache.hadoop.fs.Path(prevUt, "_SUCCESS"))
    val standingUt =
      if (bootstrapped)
        spark.read.parquet(s"${versionPath(stateDir, batchId - 1)}/ut")
      else batchUt.limit(0)
    val standingPc =
      if (bootstrapped)
        spark.read.parquet(s"${versionPath(stateDir, batchId - 1)}/pc")
      else spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("type_a",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("type_b",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("n_ab",
            org.apache.spark.sql.types.LongType))))
    val (mergedUt, mergedPc) = cooccurFold(standingUt, standingPc,
      batchUt)
    // pc lands FIRST: the predecessor gate (and any reader) keys on
    // ut/_SUCCESS, so a version is only ever visible complete
    mergedPc.write.mode("overwrite")
      .parquet(s"${versionPath(stateDir, batchId)}/pc")
    mergedUt.write.mode("overwrite")
      .parquet(s"${versionPath(stateDir, batchId)}/ut")
  }

  /** The pure co-occurrence fold shared by the streaming maintainer and
    * the batch incremental query (q213): given the standing membership
    * and pair-count frames and a batch's distinct (user_id, event_type)
    * memberships, return the folded pair. Pairs a NEW membership forms:
    * with every STANDING membership of the same user (counted once —
    * the standing side can't be new), and with OTHER new memberships of
    * the user (type-order guard keeps each unordered new×new pair
    * once) — so folded ≡ one-shot over the concatenated event stream,
    * however events split across batches. */
  def cooccurFold(standingUt: DataFrame, standingPc: DataFrame,
                  batchUt: DataFrame): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.functions._
    val newUt = batchUt.join(standingUt, Seq("user_id", "event_type"),
      "left_anti").localCheckpoint()
    val withStanding = newUt.select(col("user_id"),
        col("event_type").as("ta"))
      .join(standingUt.select(col("user_id"),
        col("event_type").as("tb")), Seq("user_id"))
    val withNew = newUt.select(col("user_id"),
        col("event_type").as("ta"))
      .join(newUt.select(col("user_id"), col("event_type").as("tb")),
        Seq("user_id"))
      .filter(col("ta") < col("tb"))
    val newPairs = withStanding.unionByName(withNew)
      .select(least(col("ta"), col("tb")).as("type_a"),
        greatest(col("ta"), col("tb")).as("type_b"))
      .groupBy("type_a", "type_b").agg(count(lit(1)).as("n_ab"))
    val mergedPc = standingPc.unionByName(newPairs)
      .groupBy("type_a", "type_b").agg(sum(col("n_ab")).as("n_ab"))
    (standingUt.unionByName(newUt), mergedPc)
  }

  /** Start the streaming co-occurrence maintainer. */
  def ingestCooccurrence(rows: DataFrame, stateDir: String,
                         checkpoint: String, userCol: String = "user_id",
                         typeCol: String = "event_type"):
      org.apache.spark.sql.streaming.StreamingQuery =
    rows.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
         batchId: Long) =>
          cooccurBatch(batch.toDF(), batchId, stateDir, userCol, typeCol)
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()

  /** The latest committed co-occurrence pair counts under `stateDir`.
    * "Committed" = the version's `ut/_SUCCESS` marker exists — the same
    * gate cooccurBatch keys its predecessor read on (pc lands before
    * ut, so ut/_SUCCESS is the version's commit point); a torn version
    * left by a crash mid-write is skipped here exactly as the stream's
    * own replay skips it. */
  def latestCooccurrence(spark: SparkSession,
                         stateDir: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(stateDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val vs = fs.listStatus(p).map(_.getPath.getName)
      .filter(_.startsWith("v=")).map(_.drop(2).toLong)
      .filter(v => fs.exists(new org.apache.hadoop.fs.Path(
        s"${versionPath(stateDir, v)}/ut/_SUCCESS")))
    require(vs.nonEmpty, s"no committed co-occurrence versions under " +
      stateDir)
    spark.read.parquet(s"${versionPath(stateDir, vs.max)}/pc")
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
