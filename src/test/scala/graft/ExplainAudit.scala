package graft

import org.scalatest.funsuite.AnyFunSuite

/** One-off audit harness (kept as an ignored-by-default tag-free
  * printer): dump executed plans of the round's new queries so the
  * scale posture can be eyeballed. Not a correctness gate. */
class ExplainAudit extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("print plans of the round-11 queries") {
    assume(sys.env.contains("GRAFT_EXPLAIN"),
      "set GRAFT_EXPLAIN=1 to run the plan printer")
    val dir = "/root/testdata/sf0.001"
    Seq("q214_streamed_cooccur", "q215_mixture_entropy",
      "q216_lexical_diversity", "q218_temperature_sampling",
      "q219_cluster_size_histogram", "q220_dup_rate_by_source")
      .foreach { q =>
        val p = SparkEntry.queries(q)(spark, dir)
          .queryExecution.executedPlan.toString
        println(s"===== $q =====")
        println(p.linesIterator.take(45).mkString("\n"))
      }
  }
}
