package graft

import org.apache.spark.sql.functions._
import graft.ext.CorpusPipeline

/** End-to-end corpus cleaning: stage counts shrink monotonically, the
  * planted near-duplicates are removed, and the cleaned corpus contains
  * no near-dup pair at the threshold (idempotence).
  */
class CorpusPipelineSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private lazy val (outDir, report) = {
    val d = java.nio.file.Files.createTempDirectory("corpus").toString
    (d, CorpusPipeline.run(spark, sfDir, d))
  }

  test("stage counts are monotonically non-increasing and end positive") {
    assert(report.input >= report.afterQuality)
    assert(report.afterQuality >= report.afterExact)
    assert(report.afterExact >= report.afterNear)
    assert(report.afterNear > 0)
  }

  test("near-dedup removed exactly the minhash-pair losers") {
    val pairs = graft.queries.Dedup.dedupMinHash(spark, sfDir)
    val losers = pairs.select(col("doc_b")).distinct().count()
    assert(report.afterExact - report.afterNear == losers)
  }

  test("cleaned corpus is near-dup free at the threshold (idempotent)") {
    val clean = spark.read.parquet(s"$outDir/corpus_clean")
    assert(clean.count() == report.afterNear)
    val remaining = CorpusPipeline.nearDupPairs(spark, clean, 0.8).count()
    assert(remaining == 0)
  }

  test("packed sequences conserve the cleaned corpus token stream") {
    val clean = spark.read.parquet(s"$outDir/corpus_clean")
    val seqs = spark.read.parquet(s"$outDir/sequences")
    assert(seqs.count() == report.sequences && report.sequences > 0)
    // Token conservation: packed tokens == cleaned-corpus tokens.
    val corpusToks = clean
      .select(sum(size(split(col("text"), " ")).cast("long"))).head.getLong(0)
    val packedToks = seqs.select(sum(col("seq_tokens"))).head.getLong(0)
    assert(packedToks == corpusToks)
    // Every sequence holds at most the 256-token budget.
    assert(seqs.filter(col("seq_tokens") > 256).count() == 0)
  }

  test("lang partitioning materialized on disk") {
    val dirs = new java.io.File(s"$outDir/corpus_clean").listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("lang="))
    assert(dirs.length >= 3)
  }
}
