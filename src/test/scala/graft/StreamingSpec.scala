package graft

import org.apache.spark.sql.functions._
import graft.streaming.EventStream

/** Streaming ≡ batch equivalence: the Structured Streaming pipelines must
  * produce exactly the batch semantics on a bounded source.
  */
class StreamingSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private lazy val sourceDir = {
    val d = java.nio.file.Files.createTempDirectory("events_src").toString
    Tables.events(spark, sfDir).repartition(8).write.mode("overwrite").parquet(d)
    d
  }

  test("streaming tumbling window equals batch groupBy(window)") {
    val streamed = EventStream.runWindowed(spark, sourceDir, "win_test")
      .select(col("window_start"), col("event_type"), col("n_events"))
    val batch = Tables.events(spark, sfDir)
      .groupBy(window(col("ts"), "1 hour")("start").as("window_start"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch.select(streamed.columns.map(col).toSeq: _*)).count() == 0)
  }

  test("streaming sliding window equals batch groupBy(window(len, slide))") {
    import org.apache.spark.sql.streaming.OutputMode
    val q = spark.readStream.schema(EventStream.eventSchema).parquet(sourceDir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour", "15 minutes")("start").as("window_start"))
      .agg(count(lit(1)).as("n_events"))
      .writeStream.format("memory").queryName("slide_test")
      .outputMode(OutputMode.Complete()).start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("slide_test")
    val batch = Tables.events(spark, sfDir)
      .groupBy(window(col("ts"), "1 hour", "15 minutes")("start").as("window_start"))
      .agg(count(lit(1)).as("n_events"))
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).count() == 0)
  }

  test("append-mode watermark drops a too-late event") {
    import org.apache.spark.sql.streaming.OutputMode
    import java.nio.file.{Files, Paths, StandardCopyOption}
    import java.nio.file.attribute.FileTime

    // Three files, one micro-batch each (maxFilesPerTrigger=1, mod-time
    // ordered). Batch 1 carries the 10:00 window AND a 12:00 event that
    // advances max event time, so the watermark after batch 1 is 11:50.
    // Batch 2's 10:05 event is then 105 minutes late → must be dropped,
    // and the finalized [10:00, 10:10) window emitted WITHOUT it.
    def mkEvents(rows: Seq[(Long, String)]): org.apache.spark.sql.DataFrame = {
      import spark.implicits._
      rows.map { case (id, t) =>
        (id, java.sql.Timestamp.valueOf(t), id % 5, "click", 1.0, "{}")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    }
    val watched = Files.createTempDirectory("late_src")
    def stage(name: String, df: org.apache.spark.sql.DataFrame, modOffsetSec: Long): Unit = {
      val tmp = Files.createTempDirectory(s"late_stage_$name").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
      val dst = watched.resolve(s"$name.parquet")
      Files.move(part.toPath, dst, StandardCopyOption.REPLACE_EXISTING)
      Files.setLastModifiedTime(dst,
        FileTime.fromMillis(System.currentTimeMillis() - 60000 + modOffsetSec * 1000))
    }
    stage("a", mkEvents(Seq(
      (1L, "2024-01-01 10:00:30"), (2L, "2024-01-01 10:02:00"),
      (3L, "2024-01-01 10:04:00"), (4L, "2024-01-01 12:00:00"))), 0)
    stage("b", mkEvents(Seq((5L, "2024-01-01 10:05:00"))), 10) // late
    stage("c", mkEvents(Seq((6L, "2024-01-01 12:30:00"))), 20)

    val q = spark.readStream.schema(EventStream.eventSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(watched.toString)
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes")("start").as("window_start"))
      .agg(count(lit(1)).as("n_events"))
      .writeStream.format("memory").queryName("late_test")
      .outputMode(OutputMode.Append()).start()
    q.processAllAvailable(); q.stop()

    val out = spark.table("late_test")
      .filter(col("window_start") === lit(java.sql.Timestamp.valueOf("2024-01-01 10:00:00")))
      .collect()
    // Exactly one finalized emission of the 10:00 window, and the late
    // event 5 is NOT in it (3 on-time events, not 4).
    assert(out.length == 1, s"expected one 10:00 window row, got ${out.toSeq}")
    assert(out.head.getAs[Long]("n_events") == 3L,
      s"late event leaked into the finalized window: ${out.toSeq}")
  }

  test("stateful sessionization closes sessions on the 30-minute gap") {
    val sessions = EventStream.runSessionize(spark, sourceDir, "sess_test")
    // Closed sessions emitted by the stream + one open session per user
    // retained in state = total batch sessions.
    val batchSessions = graft.queries.Events.eventsSession(spark, sfDir).count()
    val users = Tables.events(spark, sfDir).select("user_id").distinct().count()
    assert(sessions.count() + users == batchSessions)
    assert(sessions.filter(col("n_events") <= 0).count() == 0)
  }
}
