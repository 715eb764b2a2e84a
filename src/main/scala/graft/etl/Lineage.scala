package graft.etl

import java.sql.Timestamp
import org.apache.spark.sql.{Row, SaveMode, SparkSession}
import org.apache.spark.sql.types._

/** Data-lineage registry + log protocol, after the reference's
  * `data_lineage_registry` table (README.md:117-128,
  * generate-asset.scala:350-370) and its `logLineage` println protocol
  * (generate-asset.scala:13-19) that the workflow driver greps from logs
  * (run-all.sh:143,186). The Hive `saveAsTable(append)` becomes a
  * metastore-free parquet append (SURVEY.md §7.5.7); the DOT
  * visualization (README.md:26,87-93) is emitted from the recorded edges.
  */
final class Lineage(spark: SparkSession, registryPath: String,
                    jobId: String, jobTs: Timestamp) {

  private val schema = StructType(Seq(
    StructField("job_id", StringType),
    StructField("job_timestamp", TimestampType),
    StructField("source_path", StringType),
    StructField("target_path", StringType),
    StructField("transformation_count", IntegerType),
    StructField("record_count", LongType),
    StructField("source_files", StringType),
    StructField("description", StringType)
  ))

  private val edges = scala.collection.mutable.ArrayBuffer.empty[(String, String, String)]

  /** Record one lineage fact: println protocol + registry append. */
  def log(source: String, target: String, transformationCount: Int,
          recordCount: Long, description: String): Unit = {
    // The grep-able protocol line (reference: "LINEAGE: ..." at
    // generate-asset.scala:13-19).
    println(s"LINEAGE: job=$jobId source=$source target=$target " +
      s"transformations=$transformationCount records=$recordCount desc=$description")
    val row = Row(jobId, jobTs, source, target, transformationCount, recordCount,
      source, description)
    spark.createDataFrame(spark.sparkContext.parallelize(Seq(row), 1), schema)
      .write.mode(SaveMode.Append).parquet(registryPath)
    edges += ((source, target, description))
  }

  /** DOT digraph of everything logged so far (README.md:87-93 emits the
    * same structure from grepped log lines).
    */
  def toDot: String = {
    val quoted = edges.map { case (s, t, d) =>
      s"""  "${s.replace("\"", "")}" -> "${t.replace("\"", "")}" [label="${d.take(40)}"];"""
    }
    (Seq(s"""digraph lineage {""", s"""  label="job $jobId";""") ++ quoted :+ "}").mkString("\n")
  }
}
