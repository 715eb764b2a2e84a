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

  test("real image decode: generated PNGs yield exact, deterministic features") {
    import spark.implicits._
    // Deterministic images, encoded with the same JDK ImageIO that will
    // decode them: a constant-gray 8×4 (every luma = 32 → one hist bin)
    // and a two-tone 16×2 split half black / half white.
    def png(w: Int, h: Int, rgbAt: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgbAt(x, y))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val gray = png(8, 4, (_, _) => 0x202020)            // luma 32, bin 2
    val split = png(16, 2, (x, _) => if (x < 8) 0x000000 else 0xffffff)
    val textPayload = "not an image at all".getBytes("UTF-8")
    val media = Seq(
      Multimodal.MediaRecord(1L, "image", gray, 8, 4, 0, 1),
      Multimodal.MediaRecord(2L, "image", split, 16, 2, 0, 1),
      Multimodal.MediaRecord(3L, "image", textPayload, 0, 0, 0, 1)
    ).toDS()
    val feats = Multimodal.extractImageFeatures(media).collect().sortBy(_.media_id)
    // Undecodable bytes drop; real images decode with exact pixel math.
    assert(feats.map(_.media_id).toSeq == Seq(1L, 2L), s"got ${feats.toSeq}")
    val g = feats(0)
    assert(g.img_width == 8 && g.img_height == 4 && g.n_pixels == 32L)
    assert(g.luma_hist(2) == 32L && g.luma_hist.sum == 32L, "all gray pixels in bin 2")
    assert(g.mean_luma == 32.0)
    val s = feats(1)
    assert(s.img_width == 16 && s.img_height == 2 && s.n_pixels == 32L)
    assert(s.luma_hist(0) == 16L && s.luma_hist(15) == 16L, "half black, half white")
    assert(s.mean_luma == (16L * 0 + 16L * 255).toDouble / 32)
    // Deterministic across runs.
    val again = Multimodal.extractImageFeatures(media).collect().sortBy(_.media_id)
    assert(feats.zip(again).forall { case (a, b) =>
      a.luma_hist.sameElements(b.luma_hist) && a.mean_luma == b.mean_luma })
  }

  test("perceptual-hash dedup finds re-encoded and scaled twins, rejects tonal fakes") {
    import spark.implicits._
    def encode(img: java.awt.image.BufferedImage, fmt: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bos)
      bos.toByteArray
    }
    def mk(w: Int, h: Int, rgbAt: (Int, Int) => Int): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgbAt(x, y))
      img
    }
    def gray(v: Int): Int = (v << 16) | (v << 8) | v
    // Base: 72×64 (grid-aligned: 9 | 72, 8 | 64) structured pattern.
    val basePat = (x: Int, y: Int) => gray((x * 7 + y * 13) % 256)
    val base = mk(72, 64, basePat)
    // Twin 1: the SAME pixels losslessly re-encoded as BMP.
    // Twin 2: 2× nearest-neighbor upscale — every cell sum ×4, count ×4,
    // so the cross-multiplied hashes are bit-identical by construction.
    val scaled = mk(144, 128, (x, y) => basePat(x / 2, y / 2))
    // Unrelated content must not pair.
    val other = mk(72, 64, (x, y) => gray((x * 91 + y * 57 + 123) % 256))
    // Tonal fakes: two flat images have IDENTICAL (all-zero) dHashes —
    // no gradients anywhere — so they band-collide at Hamming 0; only
    // the normalized-histogram content gate tells 'dark' from 'light'.
    val flatDark = mk(72, 64, (_, _) => gray(32))
    val flatLight = mk(72, 64, (_, _) => gray(200))
    val media = Seq(
      Multimodal.MediaRecord(1L, "image", encode(base, "png"), 72, 64, 0, 1),
      Multimodal.MediaRecord(2L, "image", encode(base, "bmp"), 72, 64, 0, 1),
      Multimodal.MediaRecord(3L, "image", encode(scaled, "png"), 144, 128, 0, 1),
      Multimodal.MediaRecord(4L, "image", encode(other, "png"), 72, 64, 0, 1),
      Multimodal.MediaRecord(5L, "image", "not an image".getBytes("UTF-8"), 0, 0, 0, 1),
      Multimodal.MediaRecord(6L, "image", encode(flatDark, "png"), 72, 64, 0, 1),
      Multimodal.MediaRecord(7L, "image", encode(flatLight, "png"), 72, 64, 0, 1)
    ).toDS()
    val pairs = Multimodal.imageNearDupPairs(spark, media).collect()
    val pairSet = pairs.map(r => (r.getAs[Long]("media_a"), r.getAs[Long]("media_b"))).toSet
    assert(pairSet == Set((1L, 2L), (1L, 3L), (2L, 3L)),
      s"expected exactly the re-encode/scale clique, got ${pairs.toSeq}")
    // Grid-aligned twins hash bit-identically: Hamming 0, hist L1 0.
    assert(pairs.forall(_.getAs[Int]("hamming") == 0))
    assert(pairs.forall(_.getAs[Double]("hist_l1") == 0.0))
    // The flat pair collided in every band (same all-zero dHash) but the
    // content gate rejected it — absence from pairSet above proves it;
    // double-check by widening the gate, which must re-admit it.
    val loose = Multimodal.imageNearDupPairs(spark, media, maxHistL1 = 2.5).collect()
      .map(r => (r.getAs[Long]("media_a"), r.getAs[Long]("media_b"))).toSet
    assert(loose.contains((6L, 7L)),
      s"flat pair must be a Hamming-0 candidate the hist gate was rejecting: $loose")
    // Transitive groups ride the shared CC machinery.
    val groups = Multimodal.imageDupGroups(spark, media).collect()
      .map(r => (r.getAs[Long]("media_id"), r.getAs[Long]("group_id"),
        r.getAs[Long]("group_size"))).toSet
    assert(groups == Set((1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L)),
      s"got $groups")
    // Deterministic: hashing twice yields identical hashes.
    val h1 = Multimodal.imageHashes(media).collect().sortBy(_.media_id)
    val h2 = Multimodal.imageHashes(media).collect().sortBy(_.media_id)
    assert(h1.length == 6 && h1.zip(h2).forall { case (a, b) =>
      a.dhash == b.dhash && a.ahash == b.ahash && a.luma_hist.sameElements(b.luma_hist) })
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
