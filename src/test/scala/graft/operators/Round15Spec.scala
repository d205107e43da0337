package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** Round-15 pins: the streamed-certification hardening (ordinal wave
  * split that cannot degenerate when the slice modulus divides the wave
  * count; q247's empty-residue-slice short-circuit instead of an NPE)
  * and q282's pair-materializing range join planning as a salted
  * shuffle equi-join, never a nested-loop probe.
  */
class Round15Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  // --- waveOf: ordinal wave split ----------------------------------------

  test("waveOf spreads a sliced corpus across ALL waves even when the " +
    "slice modulus is a multiple of the wave count (raw doc_id % 3 put " +
    "every m=3-sliced doc in wave 0)") {
    val s = spark
    import s.implicits._
    // the m=3 certification slice: ids are exactly the multiples of 3
    val sliced = (0L until 30L by 3L).toDF("doc_id")
    val counts = (0 until 3).map { b =>
      sliced.filter(ExtensionShared.waveOf(col("doc_id"), 3L, 3) === b)
        .count()
    }
    assert(counts.forall(_ > 0), s"degenerate wave split: $counts")
    assert(counts.sum == 10, s"waves must partition the slice: $counts")
    // raw doc_id % 3 on the same slice IS degenerate — the failure mode
    // this helper exists to prevent
    val rawCounts = (0 until 3).map { b =>
      sliced.filter(col("doc_id") % 3 === b).count()
    }
    assert(rawCounts == Seq(10, 0, 0), s"expected the raw split to " +
      s"degenerate on an m=3 slice, got $rawCounts")
  }

  test("waveOf at m=1 (every oracle-checked sf) reproduces the plain " +
    "doc_id % waves split exactly") {
    val s = spark
    import s.implicits._
    val ids = (0L until 20L).toDF("doc_id")
    val got = ids.select(col("doc_id"),
      ExtensionShared.waveOf(col("doc_id"), 1L, 3).as("w")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0L until 20L).forall(i => got(i) == i % 3))
  }

  // --- q247: empty residue slice must short-circuit, not NPE --------------

  test("q247 streamed curation returns an EMPTY curated set (no NPE on " +
    "max(doc_id) = NULL) when the corpus residue slice is empty") {
    val s = spark
    import s.implicits._
    // A documents tree with only EVEN doc_ids: the q247 corpus slice
    // (doc_id % 17 != 0 AND doc_id % sliceM == 1, sliceM floored at 2)
    // selects odd residues only, so the slice is EMPTY while the eval
    // slice (doc_id % 17 == 0, includes 0) is not — exactly the shape
    // that NPE'd the tercile read before the Option short-circuit.
    val tmp = java.nio.file.Files
      .createTempDirectory("q247-empty-slice").toString
    (0L until 100L).map(i => (i * 2,
        s"alpha beta gamma delta epsilon zeta doc ${i * 2} text body",
        "en", "web", 50L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = SparkEntry.queries("q247_streamed_curation")(spark, tmp)
    assert(out.columns.toSeq == Seq("doc_id"))
    assert(out.count() == 0)
  }

  // --- q282: pair rows plan as a salted shuffle equi-join ------------------

  test("q282's point-in-interval pair join plans with NO nested-loop or " +
    "cartesian probe — the salted (bin, salt) equi-join carries the " +
    "range predicate as a post-join filter") {
    val p = SparkEntry.queries("q282_spike_window_pairs")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"), p.take(2000))
  }

  test("q282 emits pair ROWS (an order inside two overlapping spike " +
    "windows appears once per window) with day offsets inside [0, 2]") {
    val out = SparkEntry.queries("q282_spike_window_pairs")(spark, dir)
      .collect()
    assert(out.nonEmpty)
    assert(out.forall { r =>
      val off = r.getLong(r.fieldIndex("day_offset"))
      off >= 0L && off <= 2L
    })
    // pair grain: (event_id, window_start) is the key; event_ids CAN
    // repeat across windows
    val keys = out.map(r => (r.getLong(0), r.get(1)))
    assert(keys.distinct.length == keys.length)
  }
}
