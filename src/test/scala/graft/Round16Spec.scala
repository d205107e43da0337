package graft

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Multimodal

/** Round-16 pins.
  *
  * Media fixture-saturation invariants: each synthetic media family's
  * distinct-fingerprint count must scale ~linearly with its dup-class
  * modulus on a replica-strided id layout. Every media quadratic of
  * rounds 13–15 (gradient hash space capped at ~221 patterns, the
  * polynomial audio envelopes, the raw id % m replica collapse) was a
  * silent loss of exactly this invariant, each found only by the sf10
  * probe; these pins make the next re-saturation fail in `sbt test`.
  * The pins run the REAL generator + codec + fingerprint pipeline (not
  * a formula replay), so codec-level saturation is covered too.
  *
  * Plus the q283 certification-anchor contract: on an oracle-checked
  * small sf (corpus ≤ window target, cutoff = max id) the certified
  * slice IS the full q163 output — non-vacuous by construction.
  */
class Round16Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  // driver-convention fixture dir, overridable; tests that read it
  // CANCEL (assume) rather than error on machines without the tree
  val dir = sys.env.getOrElse("SPARK_GRAFT_TEST_SF_DIR",
    "/root/testdata/sf0.001")
  private def assumeTestdata(): Unit =
    assume(new java.io.File(dir).isDirectory,
      s"driver testdata tree absent: $dir")

  /** Replica-strided id layout (the ScaleUp shape in miniature):
    * dense blocks of 5000 ids spaced 10^8 apart. The layout every
    * saturation has to survive — dense heads AND stride-aligned
    * replicas. */
  private def stridedIds(n: Long): Dataset[Long] =
    spark.range(n)
      .select(expr("id % 5000 + id div 5000 * 100000000").as("id"))
      .as[Long](org.apache.spark.sql.Encoders.scalaLong)

  // dupSeedModulus values at a 5000-doc and a 50000-doc corpus: the
  // 10x corpus carries a 10x class modulus, so a non-saturating
  // fingerprint space must grow ~10x (>= 8x with collision slack)
  test("audio fixture family: distinct WAV fingerprints grow >= 8x " +
    "when the corpus (and class modulus) grows 10x — envelope " +
    "re-saturation fails here, not at the next sf10 probe") {
    def fps(n: Long, mod: Long): Long =
      Multimodal.audioFingerprint(
          Multimodal.steppedWavsForIds(stridedIds(n), mod))
        .select("h_hi", "h_lo").distinct().count()
    val small = fps(5000L, 200L)
    val big = fps(50000L, 2000L)
    assert(big >= 8 * small,
      s"audio fingerprint space saturated: $small -> $big (need 8x)")
    // and the space is actually injective per class, not just growing:
    // ~all 200 / 2000 classes must land distinct fingerprints
    assert(small >= 190 && big >= 1900,
      s"audio fingerprints collide across classes: $small/200 $big/2000")
  }

  test("image fixture family: distinct aHashes grow >= 8x when the " +
    "corpus (and class modulus) grows 10x") {
    def fps(n: Long, mod: Long): Long =
      Multimodal.imageAHash(
          Multimodal.gradientPngsForIds(stridedIds(n), mod))
        .select("h_hi", "h_lo").distinct().count()
    val small = fps(5000L, 221L)
    val big = fps(50000L, 2210L)
    assert(big >= 8 * small,
      s"image aHash space saturated: $small -> $big (need 8x)")
    assert(small >= 200 && big >= 2000,
      s"image aHashes collide across classes: $small/221 $big/2210")
  }

  test("video fixture family: distinct frame hashes grow >= 8x when " +
    "the corpus (and class modulus) grows 10x") {
    // frame-hash values are the near-dup join key, so they are the
    // saturation unit; ~4.5 expected frames per class
    def fps(n: Long, mod: Long): Long =
      Multimodal.videoFrameHashes(
          Multimodal.gradientGvidsForIds(stridedIds(n), mod))
        .select("h_hi", "h_lo").distinct().count()
    val small = fps(3000L, 150L)
    val big = fps(30000L, 1500L)
    assert(big >= 8 * small,
      s"video frame-hash space saturated: $small -> $big (need 8x)")
    assert(small >= 150 * 4 && big >= 1500 * 4,
      s"video frame hashes collide across classes: $small $big")
  }

  // --- q283: the audio near-dup 100x hash anchor ---------------------------

  test("q283 == q163 on a corpus smaller than the certification " +
    "window (cutoff = max id keeps everything), and both are " +
    "non-vacuous at the oracle-checked sf") {
    assumeTestdata()
    val full = SparkEntry.queries("q163_audio_neardup")(spark, dir)
      .collect().map(_.toString).sorted
    val cert = SparkEntry.queries("q283_audio_neardup_cert")(spark, dir)
      .collect().map(_.toString).sorted
    assert(full.nonEmpty, "q163 produced no pairs at sf0.001 — the " +
      "fixture dup classes vanished")
    assert(cert.toSeq == full.toSeq)
  }

  test("q283 restricts to the window on a corpus LARGER than the " +
    "target: pairs are exactly the full band join's pairs with both " +
    "endpoints inside the first-K-by-id window") {
    // exercise the slice arithmetic directly on fingerprints for
    // strided ids: sliced-then-join vs full-join-then-filter
    val ids = stridedIds(6000L) // spans two replica blocks
    val fp = Multimodal.audioFingerprint(
      Multimodal.steppedWavsForIds(ids, 240L))
    val cut = ids.orderBy("id").limit(5000)
      .agg(max("id")).collect()(0).getLong(0)
    val sliced = Multimodal.imageNearDupPairs(
        fp.filter(col("doc_id") <= cut))
      .collect().map(_.toString).sorted.toSeq
    val fullFiltered = Multimodal.imageNearDupPairs(fp)
      .filter(col("id_a") <= cut && col("id_b") <= cut)
      .collect().map(_.toString).sorted.toSeq
    assert(sliced.nonEmpty,
      "sliced audio near-dup set is vacuous on a 6000-doc corpus")
    assert(sliced == fullFiltered,
      "band candidacy is not pair-local: sliced join != full join " +
        "restricted to the window")
  }
}
