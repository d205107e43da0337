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
    def run(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd.count(): Unit
    def fmt(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val lines = args.toSeq.map { name =>
      run(name) // warmup (codegen, footers, standing memos)
      val obs = (1 to 3).map { _ =>
        System.gc(); Thread.sleep(200)
        val t0 = System.nanoTime()
        run(name)
        (System.nanoTime() - t0) / 1e9
      }
      s"""{"query":"$name","min":${fmt(obs.min)},"max":${fmt(obs.max)},""" +
        s""""sf":"$sfDir"}"""
    }
    spark.stop()
    lines.foreach(println)
  }
}
