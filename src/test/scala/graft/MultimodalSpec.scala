package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Multimodal

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  val dir = "/root/testdata/sf0.001"

  test("synthetic media: binary payload + typed metadata, 3 kinds") {
    val media = Multimodal.syntheticMedia(spark, dir)
    val kinds = media.toDF().groupBy("kind").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kinds.keySet == Set("image", "audio", "video"))
    assert(kinds.values.sum == 500)
    val m = media.head()
    assert(m.bytes.nonEmpty && m.meta.durationMs > 0)
  }

  test("decodeFeatures: deterministic, fixed-dim, partition-batched") {
    val media = Multimodal.syntheticMedia(spark, dir)
    val f1 = Multimodal.decodeFeatures(media, featureDim = 16).collect()
      .map(f => f.media_id -> f).toMap
    val f2 = Multimodal.decodeFeatures(media.repartition(7), 16).collect()
      .map(f => f.media_id -> f).toMap
    assert(f1.size == 500)
    assert(f1.values.forall(_.feature.length == 16))
    // partitioning must not change per-row results
    assert(f1(0L).feature.toSeq == f2(0L).feature.toSeq)
    assert(f1(0L).mean_intensity == f2(0L).mean_intensity)
    assert(f1.values.forall(f => f.mean_intensity > 0 && f.n_bytes > 0))
  }

  test("resize rewrites payload + metadata to target resolution") {
    val media = Multimodal.syntheticMedia(spark, dir)
    val out = Multimodal.resize(media, 64, 64).head()
    assert(out.meta.width == 64 && out.meta.height == 64)
    assert(out.bytes.length == 64 * 64 / 64)
  }

  test("sampleFrames emits frames only for video, spaced by everyMs") {
    val media = Multimodal.syntheticMedia(spark, dir)
    val frames = Multimodal.sampleFrames(media, everyMs = 1000).collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.offset_ms % 1000 == 0))
    val videoIds = media.filter(_.kind == "video").collect().map(_.media_id).toSet
    assert(frames.map(_.media_id).toSet.subsetOf(videoIds))
  }
}
