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
