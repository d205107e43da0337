package graft

import org.apache.spark.sql.SparkSession

/** Isolation timer: run ONLY the named queries (same session shape and
  * materialization as [[Bench]] — warmup, then min-of-3) and print one
  * JSON line per query. The tool the r9 q61 / r10 q185 investigations
  * needed: an in-suite number that moves with zero code change on the
  * query's path is either positional contamination (predecessor
  * GC/cleaner residue billing the timing window) or environmental — the
  * standalone number from this main decides which.
  *
  * Usage: runMain graft.BenchOne <query> [<query> ...]
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS.
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: BenchOne <queryName> [...]")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Bench.quietBoundedWindowWarnings()
    // same data-movement listener as Bench: isolation runs answer
    // "does the fix hold" questions, and for the spill class the
    // decisive number is spilled bytes, not seconds
    val shufRead = new java.util.concurrent.atomic.AtomicLong
    val shufWrite = new java.util.concurrent.atomic.AtomicLong
    val spillBytes = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = te.taskMetrics
          if (m != null) {
            shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
            shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
            spillBytes.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
            ()
          }
        }
      })
    def drain(): Unit = org.apache.spark.graft.ListenerDrain
      .waitUntilEmpty(spark.sparkContext, 5000): Unit
    def run(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd.count(): Unit
    def fmt(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val lines = args.toSeq.map { name =>
      // warmup (codegen, footers, standing memos) — timed and reported
      // as `cold`: cold − min is the standing-build + first-run cost, a
      // warm/cold split per query without a separate probe run
      val tc0 = System.nanoTime()
      run(name)
      val cold = (System.nanoTime() - tc0) / 1e9
      drain()
      val (r0, w0, p0) = (shufRead.get, shufWrite.get, spillBytes.get)
      val obs = (1 to 3).map { _ =>
        System.gc(); Thread.sleep(200)
        val t0 = System.nanoTime()
        run(name)
        (System.nanoTime() - t0) / 1e9
      }
      drain()
      // bytes are per timed PASS (the 3-run total divided by 3) so the
      // numbers compare directly with Bench's per-query deltas
      val (dr, dw, dp) = (shufRead.get - r0, shufWrite.get - w0,
        spillBytes.get - p0)
      s"""{"query":"$name","min":${fmt(obs.min)},"max":${fmt(obs.max)},""" +
        s""""cold":${fmt(cold)},""" +
        s""""shuffle_read_bytes":${dr / 3},""" +
        s""""shuffle_write_bytes":${dw / 3},""" +
        s""""spilled_bytes":${dp / 3},"sf":"$sfDir"}"""
    }
    spark.stop()
    lines.foreach(println)
  }
}
