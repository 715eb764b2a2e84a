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
