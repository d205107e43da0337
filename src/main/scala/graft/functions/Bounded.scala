package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Runtime certification of bounded-by-construction frames.
  *
  * A no-partition window (`Window.orderBy` with no `partitionBy`)
  * serializes its whole input through ONE task, so it is only admissible
  * over frames whose size is bounded by construction — a decile-bucket
  * domain, a per-source dim. Those bounds used to be contract-by-comment
  * at each site; this helper makes them fail fast at runtime instead:
  * a contract drift (someone widens the bucket expression, a "dim" that
  * became a fact) throws immediately rather than silently funnelling a
  * corpus through one partition.
  */
object Bounded {

  /** Certify `df` as holding at most `maxRows` rows, returning a frame
    * the caller may run a global (no-partition) window over.
    *
    * The probe is the `connectedComponents` limit+count pattern: a
    * `limit(maxRows + 1).count()` — itself bounded, never corpus-sized —
    * against a persisted handle, so the upstream aggregation is computed
    * once; the window job then reads an eager localCheckpoint of the
    * (≤ maxRows-row) certified frame, and the persist is released
    * BEFORE returning. The persist must not outlive this call: a
    * returned cached frame has no materialization point the caller
    * could unpersist after (queries return lazy DataFrames), so every
    * construction used to leak one CacheManager entry for the session
    * (repeated Bench/probe invocations accumulated copies).
    * Checkpoint blocks carry no CacheManager reference — the
    * ContextCleaner reclaims them once the returned frame is
    * unreachable, the same residue discipline as the iterative
    * queries' in-loop checkpoints.
    */
  def globalWindowFrame(df: DataFrame, maxRows: Int,
                        contract: String): DataFrame = {
    require(maxRows > 0, s"maxRows must be positive, got $maxRows")
    val cached = df.persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val probed = cached.limit(maxRows + 1).count()
      if (probed > maxRows)
        throw new IllegalStateException(
          s"bounded-global-window contract '$contract' violated: frame " +
            s"exceeds $maxRows rows — refusing to run a no-partition " +
            "window over an unbounded input")
      // eager: materializes the ≤ maxRows rows out of the cache before
      // the finally releases it
      cached.localCheckpoint(true)
    } finally cached.unpersist()
  }
}
