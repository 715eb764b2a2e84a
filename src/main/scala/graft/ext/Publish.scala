package graft.ext

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** One-command corpus PUBLISH (r12) — the full ingest-to-serving chain:
  *
  *   1. `CorpusRun.run` — JSONL ingest (quarantine), the 11-stage
  *      cleaning pipeline, sequence packing, md5-stable
  *      train/val/test split, lineage;
  *   2. stage the SERVING corpus under `outDir/serving`: the cleaned
  *      documents plus (when given) the embeddings restricted to the
  *      surviving doc_ids, re-keyed as the (vec_id, embedding) table
  *      the similarity surface reads;
  *   3. `IndexRun.run` over the serving corpus — every persisted
  *      artifact (ANN index, RP projection, phrase postings, BPE
  *      merge tables) built or drift-maintained, so queries serve the
  *      instant the publish returns.
  *
  * Re-publishing an unchanged dump is cheap by construction: the
  * pipeline re-runs (it is the thing being published), but every index
  * artifact reads as current (count + path) and provably no-ops — the
  * PublishSpec assertion. The index artifacts keep their own commit
  * disciplines (meta-last / CURRENT pointer), so a crash during the
  * index phase leaves their previous versions serving; the serving
  * corpus itself is rewritten in place here — a production publish
  * would version that dir too (the IncrementalCorpus snapshot pattern;
  * a path-stable pointer keeps the artifact currency keys valid).
  */
object Publish {

  final case class PublishReport(run: CorpusRun.RunCounts,
                                 servingDocs: Long, servingVecs: Long,
                                 index: IndexRun.IndexReport)

  def run(spark: SparkSession, inPath: String, outDir: String,
          embeddings: Option[DataFrame] = None,
          benchmarkDir: Option[String] = None,
          maxDocsPerSource: Option[Int] = None,
          containmentThreshold: Option[Double] = None): PublishReport = {
    val rc = CorpusRun.run(spark, inPath, outDir,
      benchmarkDir = benchmarkDir, embeddings = embeddings,
      maxDocsPerSource = maxDocsPerSource,
      containmentThreshold = containmentThreshold)

    val servingDir = s"$outDir/serving"
    val clean = spark.read.parquet(s"$outDir/pipeline/corpus_clean")
    clean.write.mode(SaveMode.Overwrite).parquet(s"$servingDir/documents.parquet")
    val servingDocs = spark.read.parquet(s"$servingDir/documents.parquet").count()
    val servingVecs = embeddings match {
      case None => 0L
      case Some(emb) =>
        emb.join(clean.select(col("doc_id")), Seq("doc_id"), "left_semi")
          .withColumnRenamed("doc_id", "vec_id")
          .write.mode(SaveMode.Overwrite).parquet(s"$servingDir/embeddings.parquet")
        spark.read.parquet(s"$servingDir/embeddings.parquet").count()
    }

    val index = IndexRun.run(spark, servingDir, withVectors = embeddings.nonEmpty)
    PublishReport(rc, servingDocs, servingVecs, index)
  }
}
