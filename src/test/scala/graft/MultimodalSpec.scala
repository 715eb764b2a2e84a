package graft

import graft.multimodal.Multimodal

/** The multimodal plumbing around the stubbed decode: schema, batching,
  * determinism, frame explosion.
  */
class MultimodalSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("feature extraction is deterministic, batched, and partition-preserving") {
    val media = Multimodal.mediaFromDocuments(spark, sfDir).repartition(6)
    val feats = Multimodal.extractFeatures(media)
    assert(feats.rdd.getNumPartitions == 6) // narrow map, no shuffle
    val rows = feats.collect()
    assert(rows.length == media.count())
    assert(rows.forall(_.features.length == 16))
    // L1-normalized histogram sums to ~1
    assert(rows.forall(r => math.abs(r.features.map(_.toDouble).sum - 1.0) < 1e-3))
    // deterministic: same input → same features
    val again = Multimodal.extractFeatures(media).collect()
    assert(rows.sortBy(_.media_id).zip(again.sortBy(_.media_id))
      .forall { case (a, b) => a.checksum == b.checksum && a.features.sameElements(b.features) })
  }

  test("frame sampling explodes video payloads with stride") {
    val media = Multimodal.mediaFromDocuments(spark, sfDir)
    val frames = Multimodal.sampleFrames(media, stride = 2)
    import spark.implicits._
    val videos = media.filter(_.media_type == "video").collect()
    val expected = videos.map(v => (math.max(v.n_frames, 1) + 1) / 2).sum
    assert(frames.count() == expected)
    assert(frames.filter(_.frame_idx % 2 != 0).count() == 0)
  }

  test("stub features match the verified envelope checksums") {
    import spark.implicits._
    val feats = Multimodal.extractFeatures(Multimodal.mediaFromDocuments(spark, sfDir))
      .select($"media_id", $"checksum")
    val envelope = graft.queries.Media.mediaEnvelope(spark, sfDir)
      .select($"media_id", $"checksum")
    assert(feats.exceptAll(envelope).count() == 0)
  }
}
