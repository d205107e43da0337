package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.ShuffleWidth

/** Round-18 pins.
  *
  * (1) ShuffleWidth wrap-proofing: the census runs in double and the
  * final byte estimate saturates — an extreme census must clamp to the
  * 4096 cap, never wrap negative and silently floor at the session
  * width (the r17 advice finding: `mulSat(pairs, bpp) + rb` added the
  * row term unsaturated, and the in-Spark long pair sum could wrap
  * before any driver-side guard saw it).
  *
  * (2) Sf10Probe budget routing: WarmSplit cold rows are gated against
  * the separate build budget (not exempt — an unbounded build
  * regression must fail the probe), warm rows against the per-query
  * budget, and a BASELINE_REBASES override keyed to either label wins.
  */
class Round18Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("ShuffleWidth saturates (never wraps) on an extreme census: " +
    "huge rowBytes / byte totals clamp to the 4096 cap") {
    // rb sum = 10 × 9e18 = 9e19 > Long.MaxValue: the old unsaturated
    // `+ rb` wrapped this negative and returned the session floor
    val tiny = spark.range(10).select(lit(1).as("k"))
    assert(ShuffleWidth.pairWidth(spark, tiny, Seq("k"),
      bytesPerPair = 24L, rowBytes = lit(9.0e18)) == 4096)
    val df = spark.range(10).select(lit(9.0e18).as("b"))
    assert(ShuffleWidth.bytesWidth(spark, df, col("b"),
      expansion = 1000L) == 4096)
  }

  test("ShuffleWidth keeps exact widths in the normal regime after " +
    "the double-census change (same numbers Round17Spec pins)") {
    val block = spark.range(20000).select(lit(1).as("k"))
    assert(ShuffleWidth.pairWidth(spark, block, Seq("k"),
      bytesPerPair = 24L) == 144)
  }

  test("Bench.budgetOverrides scrapes only entries keyed to the named " +
    "artifact, and fails loudly on a malformed file") {
    val dir = java.nio.file.Files.createTempDirectory("r18-ov")
    val f = dir.resolve("BASELINE_REBASES.json")
    java.nio.file.Files.writeString(f,
      """[
        |  {"query": "qA", "baseline": "BENCH_sf10.json",
        |   "budget_sec": 450.0, "cause": "x"},
        |  {"query": "qA", "baseline": "BENCH_sf10_subset.json",
        |   "budget_sec": 400.0, "cause": "y"},
        |  {"scope": "baseline", "baseline": "bench_results.json",
        |   "old_sec": 1.0, "new_sec": 2.0, "cause": "no query key"},
        |  {"query": "qB", "baseline": "BENCH_sf10.json", "old_sec": 1.0,
        |   "cause": "no budget_sec - a timing rebase, not an override"}
        |]""".stripMargin)
    assert(Bench.budgetOverrides(dir.toString, "BENCH_sf10.json") ==
      Map("qA" -> 450.0))
    assert(Bench.budgetOverrides(dir.toString, "BENCH_sf10_subset.json") ==
      Map("qA" -> 400.0))
    assert(Bench.budgetOverrides(dir.toString, "other.json").isEmpty)
    assert(Bench.budgetOverrides(
      java.nio.file.Files.createTempDirectory("r18-none").toString,
      "BENCH_sf10.json").isEmpty)
    java.nio.file.Files.writeString(f, """[{"query": "qA", """)
    intercept[IllegalArgumentException] {
      Bench.budgetOverrides(dir.toString, "BENCH_sf10.json")
    }
  }

  test("Sf10Probe.budgetFor: cold WarmSplit rows gate at the build " +
    "budget, warm rows at the query budget, overrides win per label") {
    val b = 300.0; val bb = 600.0
    // q164 joined WarmSplit in r19 (Round19Spec pins the membership)
    assert(Sf10Probe.WarmSplit == Set("q137_hnsw_ann",
      "q162_audio_fingerprint", "q164_video_frame_hashes"))
    assert(Sf10Probe.budgetFor("q137_hnsw_ann", Map.empty, b, bb) == bb)
    assert(Sf10Probe.budgetFor("q137_hnsw_ann_warm", Map.empty, b, bb) == b)
    assert(Sf10Probe.budgetFor("q53_lsh_neighbors", Map.empty, b, bb) == b)
    assert(Sf10Probe.budgetFor("q137_hnsw_ann",
      Map("q137_hnsw_ann" -> 120.0), b, bb) == 120.0)
    assert(Sf10Probe.budgetFor("q137_hnsw_ann_warm",
      Map("q137_hnsw_ann_warm" -> 5.0), b, bb) == 5.0)
  }
}
