package graft

import org.apache.spark.sql.functions._

/** Source/sink format coverage beyond the CSV/parquet the pipelines use:
  * ORC and JSON-lines round-trips preserve rows and schema-compatible
  * values. Formats are interchangeable behind the same DataFrame surface
  * — the engine property that matters when a 100 TB lake mixes layouts.
  */
class SourcesSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("ORC round-trip preserves rows and values") {
    val dir = java.nio.file.Files.createTempDirectory("orc_rt").toString
    val src = Tables.nation(spark, sfDir)
    src.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.schema == src.schema)
    assert(back.orderBy(col("n_nationkey")).collect().toSeq ==
      src.orderBy(col("n_nationkey")).collect().toSeq)
  }

  test("parquet mergeSchema unifies evolved batches (old rows null-extend)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("evolve").toString
    // Batch 1: v1 schema. Batch 2: adds a column — the lake-evolution
    // case where history is never rewritten.
    Seq((1L, "a"), (2L, "b")).toDF("id", "name")
      .write.mode("append").parquet(dir)
    Seq((3L, "c", 0.5)).toDF("id", "name", "score")
      .write.mode("append").parquet(dir)
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.sorted.toSeq == Seq("id", "name", "score"))
    assert(merged.count() == 3)
    // Old-batch rows surface with score = null, not an error.
    assert(merged.filter(col("score").isNull).count() == 2)
    assert(merged.filter(col("id") === 3L).select("score").head().getDouble(0) == 0.5)
  }

  test("CSV malformed-row modes: PERMISSIVE nulls, DROPMALFORMED skips, FAILFAST throws") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("csv_bad")
    java.nio.file.Files.writeString(dir.resolve("data.csv"),
      "id,qty\n1,10\n2,notanumber\n3,30\n")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("qty", LongType)))
    val read = (mode: String) => spark.read.schema(schema)
      .option("header", "true").option("mode", mode).csv(dir.toString)
    // PERMISSIVE (default): bad cell → null, row kept.
    val perm = read("PERMISSIVE").collect()
    assert(perm.length == 3 && perm.count(_.isNullAt(1)) == 1)
    // DROPMALFORMED: bad row skipped entirely. (collect, not count —
    // count() prunes every column, so no cell is ever parsed and
    // nothing is detected as malformed.)
    assert(read("DROPMALFORMED").collect().length == 2)
    // FAILFAST: first bad row aborts the scan.
    intercept[org.apache.spark.SparkException] { read("FAILFAST").collect() }
  }

  test("rate streaming source produces monotonically timestamped rows") {
    import org.apache.spark.sql.streaming.OutputMode
    val q = spark.readStream.format("rate")
      .option("rowsPerSecond", "50").load()
      .writeStream.format("memory").queryName("rate_smoke")
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      Thread.sleep(1200)
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("rate_smoke")
    assert(rows.count() > 0, "rate source should emit rows")
    assert(rows.columns.toSet == Set("timestamp", "value"))
  }

  test("JSON-lines round-trip preserves rows (schema re-applied on read)") {
    val dir = java.nio.file.Files.createTempDirectory("json_rt").toString
    val src = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"), col("c_acctbal"))
    src.write.mode("overwrite").json(dir)
    // JSON is schemaless on disk — reading with the explicit schema (the
    // production pattern; inference is a full extra pass at scale).
    val back = spark.read.schema(src.schema).json(dir)
    assert(back.count() == src.count())
    assert(back.exceptAll(src).count() == 0 && src.exceptAll(back).count() == 0)
  }
}
