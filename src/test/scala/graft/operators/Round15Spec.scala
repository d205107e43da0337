package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** Round-15 pins: the streamed-certification hardening (the
  * pair-preserving id-window slice — a modulus slice kills near-dup
  * pairs as 1/m² and certified an empty set at sf10; q247's
  * empty-corpus-slice short-circuit instead of an NPE) and q282's
  * pair-materializing range join planning as a salted shuffle
  * equi-join, never a nested-loop probe.
  */
class Round15Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  // --- certification window slice ------------------------------------------

  test("certSliceCutoff keeps the first `target` docs by id (pair-" +
    "preserving window) and keeps EVERYTHING when the corpus is " +
    "smaller than the target") {
    val s = spark
    import s.implicits._
    val tmp = java.nio.file.Files
      .createTempDirectory("cert-window").toString
    // sparse, shuffled ids — the cutoff must be the target-th SMALLEST
    // id, not target itself
    Seq(907L, 3L, 500L, 41L, 12000L, 77L)
      .map(i => (i, s"doc $i", "en", "web", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    assert(ExtensionShared.certSliceCutoff(spark, tmp, 4L) == 500L)
    assert(ExtensionShared.certSliceCutoff(spark, tmp, 100L) == 12000L)
  }

  // --- hashed dup classes stay uniform on strided id layouts ---------------

  test("dupSeed classes stay uniform on a replica-strided id layout " +
    "where the raw modulus collapses all replicas onto one block's " +
    "residues (the q163 sf10 quadratic)") {
    // two replica blocks of 1000 dense ids, 10^8 apart — the ScaleUp
    // layout in miniature; class modulus 2000 exceeds the block size
    val ids = (0L until 1000L) ++ (100000000L until 100001000L)
    val m = 2000L
    def dupSeed(id: Long): Long =
      id % 2147483648L * 2654435761L % 2147483648L % m
    // raw id % m: the stride is a multiple of m, so both blocks land
    // on residues 0..999 — HALF the classes empty, every class double-
    // sized, and pair volume 2x what uniform classes would give
    val rawSizes = ids.groupBy(_ % m).values.map(_.size)
    assert(rawSizes.forall(_ == 2) && rawSizes.size == 1000)
    // hashed classes: the uniform-occupancy expectation for n balls in
    // n bins is n·(1 − 1/e) ≈ 1264 occupied — measured 1265
    val hashedSizes = ids.groupBy(dupSeed).values.map(_.size)
    assert(hashedSizes.size > 1100,
      s"hashed classes collapsed: ${hashedSizes.size}")
    assert(hashedSizes.max <= 6, s"hashed pile-up: ${hashedSizes.max}")
    // pair volume (sum C(k,2)) at or below the raw layout's
    val pairs = (szs: Iterable[Int]) =>
      szs.map(k => k.toLong * (k - 1) / 2).sum
    assert(pairs(hashedSizes) < pairs(rawSizes))
  }

  // --- q247: empty corpus slice must short-circuit, not NPE ---------------

  test("q247 streamed curation returns an EMPTY curated set (no NPE on " +
    "max(doc_id) = NULL) when the corpus slice is empty") {
    val s = spark
    import s.implicits._
    // A documents tree whose every doc_id is a multiple of 17: the
    // corpus slice (doc_id % 17 != 0 AND doc_id <= window cutoff) is
    // EMPTY while the eval slice (doc_id % 17 == 0) holds everything —
    // exactly the shape that NPE'd the tercile read before the Option
    // short-circuit.
    val tmp = java.nio.file.Files
      .createTempDirectory("q247-empty-slice").toString
    (0L until 100L).map(i => (i * 17,
        s"alpha beta gamma delta epsilon zeta doc ${i * 17} text body",
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
