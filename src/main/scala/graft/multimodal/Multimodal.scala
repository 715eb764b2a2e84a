package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * payloads with typed metadata, processed by per-partition batch
  * functions (the Scala analogue of arrow-batched pandas UDFs).
  *
  * The DECODE STEP IS A STUB — this container has no image/audio codecs,
  * so `decodeStub` derives deterministic fake features from the raw
  * bytes. Everything around it is the real production shape: binary
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
