package graft

import org.apache.spark.sql.functions._

class CompactionSpec extends SparkSpec {

  test("compaction collapses a many-file layout, preserving every row") {
    val src = java.nio.file.Files.createTempDirectory("compact_src").toString
    val dst = java.nio.file.Files.createTempDirectory("compact_dst").toString + "/out"
    // 64 splits of the docs table = 64 small files (a streaming sink's
    // worth of micro-batch droppings).
    Tables.documents(spark, "/root/testdata/sf0.001")
      .repartition(64).write.mode("overwrite").parquet(src)
    val (before, after) = ext.Compaction.compact(spark, src, dst, targetBytes = 256 * 1024)
    assert(before == 64, s"expected 64 input files, saw $before")
    assert(after < before, s"no reduction: $before -> $after")
    // Multiset equality: nothing lost, nothing duplicated, source intact.
    val a = spark.read.parquet(src)
    val b = spark.read.parquet(dst)
    assert(a.count() == b.count())
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }

  test("dataFiles on a missing path is an empty listing, not a crash") {
    // The java.io.File walk NPE'd here; the Hadoop FS walk must not.
    val missing = java.nio.file.Files.createTempDirectory("compact_missing").toString + "/nope"
    assert(ext.Compaction.dataFiles(spark, missing).isEmpty)
  }

  test("compact on a missing/not-yet-written dir is a (0, 0) no-op") {
    // dataFiles alone being missing-safe is not enough: compact used to
    // fall through to spark.read.parquet(inDir) → PATH_NOT_FOUND
    // (ADVICE r6 #2).
    val base = java.nio.file.Files.createTempDirectory("compact_noop").toString
    assert(ext.Compaction.compact(spark, base + "/nope", base + "/out") == ((0, 0)))
  }

  test("dataFiles resolves an explicit file: URI (non-default scheme path)") {
    val src = java.nio.file.Files.createTempDirectory("compact_uri").toString
    Tables.documents(spark, "/root/testdata/sf0.001")
      .repartition(2).write.mode("overwrite").parquet(src)
    val files = ext.Compaction.dataFiles(spark, s"file://$src")
    assert(files.size == 2, s"expected 2 files, saw ${files.size}")
    assert(files.forall(_._2 > 0), "every data file must report its real length")
  }
}
