package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Similarity
import graft.plans.ShuffleWidth

/** Round-17 pins.
  *
  * (1) The corpus-scaled LSH plane rule: q53's fixed 4-plane signature
  * was the r16 sf10 sweep's one plan-level scale-killer (bucket count
  * constant in corpus size → within-bucket pair volume quadratic →
  * 83.7× wall for 10× data). The rule keeps expected bucket occupancy
  * ≤ 128, collapses to the historical 4 planes at every oracle-checked
  * sf, and is integer-exact so the SQL oracle mirrors it at any scale.
  *
  * (2) The data-scaled shuffle width for pair-quadratic self-joins:
  * q37/q265 spilled 11.3/8.0 GB at the fixed 128-partition sf10 width.
  * The width must floor at the session setting (≤ sf0.1 plans
  * unchanged) and grow with the censused candidate volume.
  *
  * (3) The standing bounded-window frames: r16's cache-leak fix
  * silently removed cross-invocation reuse the r15 bench numbers had
  * been measuring (accidental CacheManager plan-matching — the 6
  * flagged "regressions" of BENCH_r16). The reuse is now deliberate
  * (Standing registry); these pins hold the lifecycle contract:
  * registered after first access, released entries rebuild with
  * identical content.
  */
class Round17Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = sys.env.getOrElse("SPARK_GRAFT_TEST_SF_DIR",
    "/root/testdata/sf0.001")
  private def assumeTestdata(): Unit =
    assume(new java.io.File(dir).isDirectory,
      s"driver testdata tree absent: $dir")

  private def rows(n: Long) = spark.range(n).toDF("vec_id")

  test("scaledPlanes: floors at 4 through sf0.1 (oracle results " +
    "unchanged) and grows log2 with the corpus — 8 at sf1, 11 at sf10") {
    assert(Similarity.scaledPlanes(rows(1)) == 4)
    assert(Similarity.scaledPlanes(rows(500)) == 4) // sf0.001/sf0.01
    assert(Similarity.scaledPlanes(rows(2000)) == 4) // sf0.1
    assert(Similarity.scaledPlanes(rows(20000)) == 8) // sf1
    assert(Similarity.scaledPlanes(rows(200000)) == 11) // sf10
    // exact-power boundary: 128·2^p = n must give p (not p+1) — the
    // reason the rule is a shift loop, not a float log2
    assert(Similarity.scaledPlanes(rows(128L << 11)) == 11)
    assert(Similarity.scaledPlanes(rows((128L << 11) + 1)) == 12)
    // cap: never past 24 (the oracle enumerates 24 plane literals)
    assert(Similarity.scaledPlanes(rows(1), target = 1L,
      minPlanes = 1) == 1)
  }

  test("scaledPlanes bounds expected bucket occupancy: corpus/2^planes " +
    "<= 128 at every tested sf, so candidate volume stays linear") {
    for (n <- Seq(500L, 2000L, 20000L, 200000L, 2000000L)) {
      val p = Similarity.scaledPlanes(rows(n))
      assert(n.toDouble / (1L << p) <= 128.0,
        s"n=$n planes=$p occupancy=${n.toDouble / (1L << p)}")
    }
  }

  test("ShuffleWidth.pairWidth floors at the session width on small " +
    "inputs and grows with the censused pair volume") {
    val session = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val tiny = spark.range(100).select((col("id") % 10).as("k"))
    assert(ShuffleWidth.pairWidth(spark, tiny, Seq("k"),
      bytesPerPair = 24L) == session)
    // one block of 20k rows → 199,990,000 pairs × 24 B = 4.8 GB →
    // ceil(4.8 GB / 32 MiB) = 144 partitions
    val block = spark.range(20000).select(lit(1).as("k"))
    val w = ShuffleWidth.pairWidth(spark, block, Seq("k"),
      bytesPerPair = 24L)
    assert(w > session && w <= 4096, s"width=$w")
    assert(w == 144, s"width=$w (expected 144)")
  }

  test("ShuffleWidth.bytesWidth: session floor, linear growth, 4096 cap") {
    val session = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val df = spark.range(1000).select(lit(1000L).as("b")) // 1 MB total
    assert(ShuffleWidth.bytesWidth(spark, df, col("b"),
      expansion = 1L) == session)
    val w = ShuffleWidth.bytesWidth(spark, df, col("b"), expansion = 3200L)
    assert(w == 96, s"width=$w (ceil(3.2e9 B / 32 MiB) = 96)")
    assert(ShuffleWidth.bytesWidth(spark, df, col("b"),
      expansion = Long.MaxValue / 2000000L) == 4096)
  }

  test("standing bounded-window frames: registered on first access, " +
    "release rebuilds with identical content (q233/q273 share one " +
    "frame; q103/q175/q226/q228 own theirs)") {
    assumeTestdata()
    graft.sources.Standing.release(spark, dir)
    def res(q: String): Seq[String] =
      SparkEntry.queries(q)(spark, dir).collect().map(_.toString).toSeq
    val first = Map(
      "q233_quality_calibration" -> res("q233_quality_calibration"),
      "q273_gain_curve" -> res("q273_gain_curve"),
      "q103_range_join" -> res("q103_range_join"))
    val names = graft.sources.Standing.registered(spark, dir)
    // q233 and q273 must have materialized ONE shared census
    assert(names.contains("alpha-gopher-buckets"), names.toString)
    assert(names.contains("q103-dense-calendar"), names.toString)
    val released = graft.sources.Standing.release(spark, dir)
    assert(released >= 2)
    // rebuild-on-next-access must reproduce the first build exactly
    first.foreach { case (q, want) => assert(res(q) == want, q) }
  }
}
