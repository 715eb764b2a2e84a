package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Verified slice of the multimodal surface (graft.multimodal): the
  * oracle-expressible parts of the media pipeline — opaque binary
  * payloads with typed metadata, checksums, byte stats, shard keys. The
  * codec-dependent decode lives behind the mapPartitions stub in
  * `Multimodal.extractFeatures` (unit-tested, not oracle-verified: DuckDB
  * has no codec either — that's the point of the stub).
  */
object Media {
  import Tables._
  type Q = (SparkSession, String) => DataFrame

  /** Payload envelope: binary payload from the doc corpus, md5 checksum,
    * byte length, media-type assignment, 16-way shard bucket — the
    * metadata layer every multimodal lake query filters on.
    */
  val mediaEnvelope: Q = (spark, dir) =>
    documents(spark, dir)
      .select(
        col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
        col("text").cast("binary").as("payload"),
        col("n_chars"))
      .select(
        col("media_id"),
        col("media_type"),
        md5(col("payload")).as("checksum"),
        octet_length(col("payload")).cast("long").as("n_bytes"),
        (expr("instr('0123456789abcdef', substr(md5(payload), 1, 1))") - 1)
          .cast("long").as("shard_bucket"),
        (col("n_chars") % 24 + 1).cast("long").as("n_frames"))
      .orderBy(col("media_id"))

  val mediaEnvelopeSql: String =
    """SELECT doc_id AS media_id,
      |  ['image', 'audio', 'video'][(doc_id % 3 + 1)::INT] AS media_type,
      |  md5(text) AS checksum,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |  CAST(instr('0123456789abcdef', substr(md5(text), 1, 1)) - 1 AS BIGINT) AS shard_bucket,
      |  CAST(n_chars % 24 + 1 AS BIGINT) AS n_frames
      |FROM documents ORDER BY media_id""".stripMargin

  /** Per-type storage rollup over the envelope — the capacity-planning
    * aggregate (bytes, frames, distinct shards per media type).
    */
  val mediaRollup: Q = (spark, dir) =>
    mediaEnvelope(spark, dir)
      .groupBy(col("media_type"))
      .agg(
        count(lit(1)).as("n_media"),
        sum(col("n_bytes")).as("total_bytes"),
        sum(col("n_frames")).as("total_frames"),
        countDistinct(col("shard_bucket")).as("shards_used"))
      .orderBy(col("media_type"))

  val mediaRollupSql: String =
    """WITH env AS (
      |  SELECT ['image', 'audio', 'video'][(doc_id % 3 + 1)::INT] AS media_type,
      |    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |    CAST(instr('0123456789abcdef', substr(md5(text), 1, 1)) - 1 AS BIGINT) AS shard_bucket,
      |    CAST(n_chars % 24 + 1 AS BIGINT) AS n_frames
      |  FROM documents)
      |SELECT media_type, count(*) AS n_media,
      |  CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
      |  CAST(sum(n_frames) AS BIGINT) AS total_frames,
      |  count(DISTINCT shard_bucket) AS shards_used
      |FROM env GROUP BY media_type ORDER BY media_type""".stripMargin

  /** Deterministic frame sampling: up to 8 evenly-strided frame indices
    * per video — the metadata half of frame extraction (pixel decode is
    * the multimodal stub). Downstream decode tasks fetch ONLY the
    * sampled offsets, so a 100 TB video corpus reads kilobytes of frame
    * metadata per asset instead of the payload. Pure per-row flatMap —
    * generated stride sequence, no shuffle before the output sort.
    */
  val mediaFrames: Q = (spark, dir) =>
    mediaEnvelope(spark, dir)
      .filter(col("media_type") === "video")
      .withColumn("stride", greatest(lit(1L), expr("n_frames div 8")))
      .withColumn("frame_idx", explode(expr("slice(sequence(1L, n_frames, stride), 1, 8)")))
      .select(
        col("media_id"), col("n_frames"), col("frame_idx"),
        graft.queries.Det.r4(col("frame_idx").cast("double") / col("n_frames").cast("double"))
          .as("position_ratio"))
      .orderBy(col("media_id"), col("frame_idx"))

  val mediaFramesSql: String =
    s"""WITH env AS (
       |  SELECT doc_id AS media_id,
       |    ['image', 'audio', 'video'][(doc_id % 3 + 1)::INT] AS media_type,
       |    CAST(n_chars % 24 + 1 AS BIGINT) AS n_frames
       |  FROM documents),
       |v AS (
       |  SELECT media_id, n_frames,
       |    greatest(1, n_frames // 8) AS stride
       |  FROM env WHERE media_type = 'video')
       |SELECT media_id, n_frames,
       |  unnest(generate_series(1, n_frames, stride)[1:8]) AS frame_idx,
       |  ${graft.queries.Det.sqlR4("CAST(unnest(generate_series(1, n_frames, stride)[1:8]) AS DOUBLE) / CAST(n_frames AS DOUBLE)")} AS position_ratio
       |FROM v ORDER BY media_id, frame_idx""".stripMargin

  val queries: Map[String, Q] = Map(
    "q_media_envelope" -> mediaEnvelope,
    "q_media_rollup" -> mediaRollup,
    "q_media_frames" -> mediaFrames
  )

  val oracles: Map[String, String] = Map(
    "q_media_envelope" -> mediaEnvelopeSql,
    "q_media_rollup" -> mediaRollupSql,
    "q_media_frames" -> mediaFramesSql
  )
}
