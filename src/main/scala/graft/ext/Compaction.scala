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

  /** Parquet data files under `dir` as (path, length), via the Hadoop
    * FileSystem API — the same abstraction the parquet scan itself uses,
    * so HDFS/S3A/file: URIs all resolve (a java.io.File walk sees only
    * the local filesystem: it NPEs on a missing path and silently sizes
    * everything 0 on any remote scheme). A missing directory is an empty
    * listing, not an error — compaction of a not-yet-written sink dir is
    * a no-op, not a crash.
    */
  def dataFiles(spark: SparkSession, dir: String): Seq[(String, Long)] = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) Seq.empty
    else {
      val it = fs.listFiles(path, /* recursive = */ true)
      val buf = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
      while (it.hasNext) {
        val st = it.next()
        if (st.isFile && st.getPath.getName.endsWith(".parquet"))
          buf += ((st.getPath.toString, st.getLen))
      }
      buf.toSeq
    }
  }

  /** Rewrite `inDir` into `outDir` with ≈⌈totalBytes/targetBytes⌉ files.
    * Returns (filesBefore, filesAfter).
    */
  def compact(spark: SparkSession, inDir: String, outDir: String,
              targetBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    val before = dataFiles(spark, inDir)
    if (before.isEmpty) return (0, 0) // not-yet-written sink dir: no-op, not a PATH_NOT_FOUND crash
    val totalBytes = before.map(_._2).sum
    val nFiles = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    spark.read.parquet(inDir)
      .repartition(nFiles) // round-robin: even file sizes, no skew by key
      .write.mode(SaveMode.Overwrite).parquet(outDir)
    (before.size, dataFiles(spark, outDir).size)
  }
}
