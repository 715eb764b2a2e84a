package graft.ext

import org.apache.spark.sql.{SaveMode, SparkSession}

/** Small-file compaction — the operational companion every incremental
  * writer needs at scale. Streaming sinks (foreachBatch parquet, the
  * lineage registry's appends) and per-increment dedup outputs land one
  * file per micro-batch per partition; after months that is millions of
  * KB-sized files, and scan planning (file listing + footer reads)
  * dominates query time long before row count does.
  *
  * `compact` rewrites a parquet directory to ≈⌈bytes/target⌉ files via a
  * round-robin repartition (no shuffle key — pure rebalance), writing to
  * a NEW directory and never touching the source: at 100 TB compaction
  * must be restartable and atomic-by-rename, so the swap is the caller's
  * (or the table format's) job, not a destructive in-place rewrite.
  * Content is preserved row-for-row (CompactionSpec asserts multiset
  * equality and the file-count drop).
  */
object Compaction {

  /** Parquet data files under `dir` (ignores _SUCCESS/_metadata/CRCs). */
  def dataFiles(dir: String): Seq[java.io.File] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
      else if (f.getName.endsWith(".parquet")) Seq(f)
      else Seq.empty
    walk(new java.io.File(dir))
  }

  /** Rewrite `inDir` into `outDir` with ≈⌈totalBytes/targetBytes⌉ files.
    * Returns (filesBefore, filesAfter).
    */
  def compact(spark: SparkSession, inDir: String, outDir: String,
              targetBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    val before = dataFiles(inDir)
    val totalBytes = before.map(_.length()).sum
    val nFiles = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    spark.read.parquet(inDir)
      .repartition(nFiles) // round-robin: even file sizes, no skew by key
      .write.mode(SaveMode.Overwrite).parquet(outDir)
    (before.size, dataFiles(outDir).size)
  }
}
