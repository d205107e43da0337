package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Bounded

/** Round-13 hardening pins: the bounded-global-window helper that
  * replaced the four contract-by-comment no-partition window sites
  * (q226/q228 decile buckets, q273 score buckets,
  * Mixing.unimaxAllocation's source dim), and the tmpdir hygiene of the
  * streamed-query state trees.
  */
class Round13Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  test("Bounded.globalWindowFrame admits a frame at the bound and " +
    "returns the same rows") {
    val spark2 = spark
    import spark2.implicits._
    val df = (1 to 10).map(i => (i.toLong, s"v$i")).toDF("k", "v")
    val out = Bounded.globalWindowFrame(df, maxRows = 10,
      contract = "spec fixture")
    assert(out.collect().map(_.getLong(0)).sorted.toSeq == (1L to 10L))
  }

  test("Bounded.globalWindowFrame fails fast past the bound — a " +
    "contract drift cannot silently serialize a corpus through one " +
    "partition") {
    val spark2 = spark
    import spark2.implicits._
    val df = spark.range(1000).select(col("id").as("k"))
    val e = intercept[IllegalStateException] {
      Bounded.globalWindowFrame(df, maxRows = 10, contract = "spec drift")
    }
    assert(e.getMessage.contains("spec drift") &&
      e.getMessage.contains("no-partition window"))
  }

  test("the four migrated sites still produce their pinned shapes: " +
    "q226/q228 <= 10 decile rows, q273 <= 11 bucket rows, " +
    "unimaxAllocation rows == |sources|") {
    Seq("q226_bigram_novelty", "q228_incremental_novelty").foreach { q =>
      val rows = SparkEntry.queries(q)(spark, dir).collect()
      assert(rows.length <= 10, s"$q: ${rows.length}")
    }
    assert(SparkEntry.queries("q273_gain_curve")(spark, dir)
      .count() <= 11)
    val spark2 = spark
    import spark2.implicits._
    val counts = (1 to 23).map(i => (s"s$i", i.toLong * 100))
      .toDF("source", "tokens")
    assert(graft.functions.Mixing
      .unimaxAllocation(counts, 40000L, 3).count() == 23)
  }

  test("streamed-query state trees register for shutdown deletion and " +
    "freshRun nests under the registered appState root") {
    val app = graft.sources.TmpDirs.appState(spark, dir, "r13spec")
    val run = graft.sources.TmpDirs.freshRun(spark, dir, "r13spec")
    assert(run.startsWith(app + "/run-"))
    // deterministic keying: same (session, dir, tag) -> same tree
    assert(graft.sources.TmpDirs.appState(spark, dir, "r13spec") == app)
  }

  // The r13 sf1 failure class: a long-kernel TypedImperativeAggregate
  // fed an int32 column crashed at EVAL time (boxed-Integer unbox in
  // update()) — only at the one sf whose parquet happened to land the
  // column narrow. All three long-input aggregates now declare
  // inputTypes so the ANALYZER widens byte/short/int children; these
  // pins feed each one an int column and assert the widened result
  // equals the explicitly-cast-long run.
  test("long-kernel aggregates widen integral input at analysis " +
    "instead of crashing at eval (KllAgg, MinKAgg, BloomAgg)") {
    val spark2 = spark
    import spark2.implicits._
    val ints = (1 to 100).map(i => (i % 7) * 100 + i).toDF("v") // int32
    def viaInt(c: org.apache.spark.sql.Column) =
      ints.agg(c).collect()(0)
    def viaLong(c: org.apache.spark.sql.Column) =
      ints.select(col("v").cast("long").as("v")).agg(c).collect()(0)

    import graft.functions.Sketches
    assert(viaInt(Sketches.kllSketch(col("v"), 256)) ==
      viaLong(Sketches.kllSketch(col("v"), 256)))
    assert(viaInt(Sketches.minK(col("v"), 16)) ==
      viaLong(Sketches.minK(col("v"), 16)))
    val bloom = org.apache.spark.sql.graftops.ColumnBridge.column(
      graft.plans.BloomAgg(
        org.apache.spark.sql.graftops.ColumnBridge.expression(col("v")),
        numBits = 1024, numHashes = 3).toAggregateExpression())
    assert(viaInt(bloom) == viaLong(bloom))
  }
}
