package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * payloads with typed metadata, processed by per-partition batch
  * functions (the Scala analogue of arrow-batched pandas UDFs).
  *
  * IMAGE decode is REAL (`decodeImage`/`extractImageFeatures` via the
  * in-JDK `javax.imageio` — PNG/BMP/GIF/JPEG). AUDIO/VIDEO decode stays
  * a STUB — this container has no av codecs — so `decodeStub` derives
  * deterministic fake features from the raw bytes; it also remains the
  * codec-free path the DuckDB oracle twins pin (an oracle cannot run
  * ImageIO). Everything around both is the real production shape: binary
  * columns in parquet, case-class Encoders, mapPartitions batching (one
  * JNI/codec init per partition, not per row), partition-preserving
  * feature extraction, frame explosion for video-like payloads.
  *
  * Scale notes: payloads stay opaque end-to-end (no driver collect); a
  * real deployment would store blob offsets/URIs instead of inline bytes
  * beyond ~1 MB and fetch inside the partition iterator; feature
  * extraction is a narrow map — zero shuffles until the consumer
  * aggregates.
  */
object Multimodal {

  /** One media object: payload + typed metadata (the schema a 100 TB
    * media lake would carry per row).
    */
  case class MediaRecord(
      media_id: Long,
      media_type: String, // image | audio | video
      payload: Array[Byte],
      width: Int,
      height: Int,
      sample_rate: Int,
      n_frames: Int)

  case class MediaFeatures(
      media_id: Long,
      media_type: String,
      n_bytes: Long,
      checksum: String,
      features: Array[Float]) // stub embedding

  case class Frame(media_id: Long, frame_idx: Int, frame_bytes: Array[Byte])

  /** STUB decode/feature-extract: a real implementation would hand the
    * bytes to an image/audio codec here (one codec instance per
    * partition). The fake features — a 16-bin byte histogram, L1
    * normalized — are deterministic in the payload, so tests and oracles
    * can pin them.
    */
  def decodeStub(payload: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](16)
    var i = 0
    while (i < payload.length) { hist((payload(i) & 0xff) % 16) += 1f; i += 1 }
    val n = math.max(payload.length, 1).toFloat
    hist.map(_ / n)
  }

  /** Batched feature extraction: mapPartitions so per-partition setup
    * (codec init, model load) happens once per task — the arrow-batch
    * shape, not a per-row UDF.
    */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition init would go here (codec / model handle)
      val digest = java.security.MessageDigest.getInstance("MD5")
      rows.map { m =>
        digest.reset()
        val sum = digest.digest(m.payload).map("%02x".format(_)).mkString
        MediaFeatures(m.media_id, m.media_type, m.payload.length.toLong, sum,
          decodeStub(m.payload))
      }
    }
  }

  /** Frame sampling for video-like payloads: slice the payload into
    * n_frames equal chunks and keep every `stride`-th — the row-explosion
    * shape of video pipelines (narrow, partition-preserving).
    */
  def sampleFrames(media: Dataset[MediaRecord], stride: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.media_type == "video").flatMap { m =>
      val n = math.max(m.n_frames, 1)
      val frameLen = math.max(m.payload.length / n, 1)
      (0 until n by stride).iterator.map { k =>
        val from = math.min(k * frameLen, m.payload.length)
        val until = math.min(from + frameLen, m.payload.length)
        Frame(m.media_id, k, java.util.Arrays.copyOfRange(m.payload, from, until))
      }
    }
  }

  case class ImageFeatures(
      media_id: Long,
      img_width: Int,
      img_height: Int,
      n_pixels: Long,
      luma_hist: Array[Long], // 16-bin luminance histogram
      mean_luma: Double)

  /** REAL image decode — `javax.imageio` ships in the JDK, so PNG / BMP /
    * GIF / JPEG payloads decode with no external codec. Returns None for
    * bytes ImageIO cannot decode (e.g. the corpus's text stand-in
    * payloads), so this path coexists with `decodeStub`: the stub keeps
    * the codec-free oracle twins deterministic, this decodes actual
    * images. Features are integer-exact (BT.601 luma via the rational
    * (299r+587g+114b)/1000, 16-bin histogram, Long sums), so repeated
    * decodes are bit-identical.
    */
  def decodeImage(payload: Array[Byte]): Option[(Int, Int, Array[Long], Long)] = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case _: Exception => null }
    if (img == null) None
    else {
      val w = img.getWidth
      val h = img.getHeight
      val hist = new Array[Long](16)
      var lumaSum = 0L
      // getRGB row-batched: one int[] per row, not a per-pixel call (a
      // production decoder would read the raster directly; this keeps
      // the JDK-only path reasonable).
      val row = new Array[Int](w)
      var y = 0
      while (y < h) {
        img.getRGB(0, y, w, 1, row, 0, w)
        var x = 0
        while (x < w) {
          val rgb = row(x)
          val luma = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
            (rgb & 0xff) * 114) / 1000
          hist(luma >> 4) += 1L
          lumaSum += luma
          x += 1
        }
        y += 1
      }
      Some((w, h, hist, lumaSum))
    }
  }

  /** Batched REAL feature extraction over image payloads: the same
    * mapPartitions shape as `extractFeatures` (per-partition codec init,
    * narrow, partition-preserving), decoding with the in-JDK ImageIO.
    * Undecodable payloads are dropped — the caller splits decoded vs
    * quarantined by anti-join on media_id if it needs the failures.
    */
  def extractImageFeatures(media: Dataset[MediaRecord]): Dataset[ImageFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // Per-partition codec init: in-memory decode only, no ImageIO
      // temp-file cache competing with shuffle spill for local disk.
      javax.imageio.ImageIO.setUseCache(false)
      rows.flatMap { m =>
        decodeImage(m.payload).map { case (w, h, hist, lumaSum) =>
          val n = w.toLong * h
          ImageFeatures(m.media_id, w, h, n, hist, lumaSum.toDouble / n)
        }
      }
    }
  }

  case class ImageHash(
      media_id: Long,
      dhash: Long,        // 64-bit difference hash (9×8 grid, row-wise gradients)
      ahash: Long,        // 64-bit average hash (8×8 grid vs global mean)
      n_pixels: Long,
      luma_hist: Array[Long])

  /** Pooled luma grid: per-cell (sum, count) of the integer BT.601 luma,
    * cell index = floor(x·cols/W), floor(y·rows/H). Everything stays in
    * Long — downstream comparisons cross-multiply instead of dividing,
    * so the hashes are integer-EXACT: a lossless re-encode (identical
    * pixels) and a nearest-neighbor k× upscale of a grid-aligned image
    * (every cell sum scales by k², count by k²) produce bit-identical
    * hashes, no float rounding anywhere.
    */
  private def gridLuma(img: java.awt.image.BufferedImage, cols: Int, rows: Int)
      : (Array[Long], Array[Long], Array[Long], Long) = {
    val w = img.getWidth
    val h = img.getHeight
    val sums = new Array[Long](cols * rows)
    val cnts = new Array[Long](cols * rows)
    val hist = new Array[Long](16)
    var lumaSum = 0L
    val row = new Array[Int](w)
    var y = 0
    while (y < h) {
      img.getRGB(0, y, w, 1, row, 0, w)
      val yc = y * rows / h
      var x = 0
      while (x < w) {
        val rgb = row(x)
        val luma = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
          (rgb & 0xff) * 114) / 1000
        val cell = yc * cols + x * cols / w
        sums(cell) += luma
        cnts(cell) += 1L
        hist(luma >> 4) += 1L
        lumaSum += luma
        x += 1
      }
      y += 1
    }
    (sums, cnts, hist, lumaSum)
  }

  /** Perceptual hashes of one decoded image.
    *
    * dHash: 9-wide × 8-tall pooled grid; bit (r, c) = cell(r,c) brighter
    * than cell(r,c+1), compared as sumA·cntB > sumB·cntA — the row-wise
    * luminance gradient signature, robust to re-encoding and scaling.
    * aHash: 8×8 grid; bit = cell brighter than the global mean
    * (sum·64-cells-count cross-multiplied likewise). Both 64-bit Longs.
    */
  def perceptualHashes(payload: Array[Byte]): Option[ImageHash] = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case _: Exception => null }
    if (img == null) None
    else {
      val (dSums, dCnts, hist, _) = gridLuma(img, 9, 8)
      var dhash = 0L
      var r = 0
      while (r < 8) {
        var c = 0
        while (c < 8) {
          val a = r * 9 + c
          val b = a + 1
          if (dSums(a) * dCnts(b) > dSums(b) * dCnts(a))
            dhash |= 1L << (r * 8 + c)
          c += 1
        }
        r += 1
      }
      val (aSums, aCnts, _, _) = gridLuma(img, 8, 8)
      var totalSum = 0L; var totalCnt = 0L
      var i = 0
      while (i < 64) { totalSum += aSums(i); totalCnt += aCnts(i); i += 1 }
      var ahash = 0L
      i = 0
      while (i < 64) {
        if (aSums(i) * totalCnt > totalSum * aCnts(i)) ahash |= 1L << i
        i += 1
      }
      val n = img.getWidth.toLong * img.getHeight
      Some(ImageHash(0L, dhash, ahash, n, hist))
    }
  }

  /** Batched perceptual hashing: same mapPartitions shape as
    * `extractImageFeatures` (per-partition codec init, narrow,
    * partition-preserving); undecodable payloads drop.
    */
  def imageHashes(media: Dataset[MediaRecord]): Dataset[ImageHash] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.flatMap(m => perceptualHashes(m.payload).map(_.copy(media_id = m.media_id)))
    }
  }

  /** Image-content near-dup pairs — the bridge between the real decoder
    * and the dedup machinery. Same banding discipline as SimHash text
    * dedup (Dedup.dedupSimHash): the 64-bit dHash splits into 4×16-bit
    * bands; candidates share ≥1 band (equi-join on (band_idx, bits) —
    * never all-pairs), and by pigeonhole every pair within Hamming
    * distance 3 shares a clean band, so banding loses nothing the
    * verify would keep. Verify is two-stage: bit_count(dhash XOR) ≤
    * `maxHamming`, then the decoded luma histograms must agree in
    * DISTRIBUTION — L1 distance of the pixel-count-normalized 16-bin
    * histograms ≤ `maxHistL1` (scale-invariant: a k× nearest-neighbor
    * upscale multiplies every bin and the pixel count by k², leaving
    * the normalized histogram exactly unchanged) — so a gradient-hash
    * collision between tonally different images is rejected on content.
    *
    * Scale shape: hash = one narrow decode pass; candidates = bucketed
    * self-join on the band key; verify touches only candidate pairs.
    * Identical to the text LSH pipeline, with dHash bands as the
    * sketch.
    */
  def imageNearDupPairs(spark: SparkSession, media: Dataset[MediaRecord],
                        maxHamming: Int = 3, maxHistL1: Double = 0.05): DataFrame = {
    val hashed = imageHashes(media).toDF()
    val banded = hashed.select(col("media_id"), col("dhash"),
      explode(expr(
        "transform(sequence(0, 3), k -> struct(k AS band_idx, " +
          "shiftright(dhash, k * 16) & 65535 AS bits))")).as("band"))
      .select(col("media_id"), col("dhash"), col("band.band_idx"), col("band.bits"))
    val cand = banded.as("a").join(banded.as("b"),
        col("a.band_idx") === col("b.band_idx") && col("a.bits") === col("b.bits") &&
          col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("media_a"), col("b.media_id").as("media_b"))
      .distinct()
    val ha = hashed.select(col("media_id").as("media_a"), col("dhash").as("dh_a"),
      col("n_pixels").as("np_a"), col("luma_hist").as("hist_a"))
    val hb = hashed.select(col("media_id").as("media_b"), col("dhash").as("dh_b"),
      col("n_pixels").as("np_b"), col("luma_hist").as("hist_b"))
    cand.join(ha, "media_a").join(hb, "media_b")
      .withColumn("hamming", expr("bit_count(dh_a ^ dh_b)"))
      .filter(col("hamming") <= maxHamming)
      .withColumn("hist_l1", expr(
        "aggregate(zip_with(hist_a, hist_b, (x, y) -> " +
          "abs(CAST(x AS DOUBLE) / np_a - CAST(y AS DOUBLE) / np_b)), " +
          "0.0D, (acc, v) -> acc + v)"))
      .filter(col("hist_l1") <= maxHistL1)
      .select(col("media_a"), col("media_b"), col("hamming"), col("hist_l1"))
      .orderBy(col("media_a"), col("media_b"))
  }

  /** Transitive image-dup groups: the verified pairs feed the SAME
    * connected-components fixpoint the text dedup uses — (media_id,
    * group_id, group_size), group = min member id.
    */
  def imageDupGroups(spark: SparkSession, media: Dataset[MediaRecord],
                     maxHamming: Int = 3, maxHistL1: Double = 0.05): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pairs = imageNearDupPairs(spark, media, maxHamming, maxHistL1)
      .select(col("media_a").as("src"), col("media_b").as("dst"))
    val (labels, _) = graft.queries.Dedup.connectedComponents(pairs)
    labels
      .withColumn("group_size",
        count(lit(1)).over(Window.partitionBy(col("lbl"))).cast("long"))
      .select(col("doc").as("media_id"), col("lbl").as("group_id"), col("group_size"))
      .orderBy(col("media_id"))
  }

  /** Build a deterministic media table from the documents corpus: the
    * text bytes stand in for the opaque payload (real pipelines would
    * read blob files); metadata derives from doc stats.
    */
  def mediaFromDocuments(spark: SparkSession, sfDir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    graft.Tables.documents(spark, sfDir)
      .select(
        col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
        col("text").cast("binary").as("payload"),
        (col("n_chars") % 640 + 1).cast("int").as("width"),
        (col("n_chars") % 480 + 1).cast("int").as("height"),
        lit(16000).as("sample_rate"),
        (col("n_chars") % 24 + 1).cast("int").as("n_frames"))
      .as[MediaRecord]
  }
}
