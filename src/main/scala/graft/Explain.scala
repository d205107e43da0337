package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection utility: prints the formatted physical plan of one
  * registered query (or all) so shuffle count, exchange reuse, pushed
  * filters, and whole-stage-codegen spans can be iterated on without a
  * full bench run.
  *
  * Usage: runMain graft.Explain <query_name|all> [sfDir] [-run]
  * With -run the query is executed (timed) and the FINAL adaptive plan is
  * printed — the only way to see AQE's runtime decisions (stage reuse,
  * join strategy switches, coalesced partitions).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val run = args.contains("-run")
    val rest = args.filterNot(_ == "-run")
    val name = rest.headOption.getOrElse("all")
    val sfDir =
      if (rest.length > 1) rest(1) else "/root/testdata/sf0.001"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names =
      if (name == "all") SparkEntry.queries.keys.toSeq.sorted
      else Seq(name)
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      println(s"========== $n ==========")
      if (run) {
        val t0 = System.nanoTime()
        val rows = df.queryExecution.toRdd.count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[$n] rows=$rows sec=$sec%.3f (final adaptive plan below)")
      }
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    }
    spark.stop()
  }
}
