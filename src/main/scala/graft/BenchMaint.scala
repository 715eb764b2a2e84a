package graft

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Maintenance-path scaling measurement (r13 VERDICT #4): the WRITE side
  * of the artifact story, measured instead of asserted. BENCH_SCALE
  * curves the queries; this curves the maintainers — full index build vs
  * a 1% and a 10% increment append (postings + ANN drift-append) plus
  * one full Publish — reporting wall seconds, increment rows and BYTES
  * ACTUALLY WRITTEN (new files in the committed version vs its parent:
  * hard-linked carry-over costs nothing, which is the whole point of the
  * version chain's O(increment) claim). An append whose wall or bytes
  * scale with the CORPUS rather than the increment would surface here as
  * append≈build; O(increment) shows as append(10%) ≈ 10× append(1%) ≪
  * build, modulo fixed per-commit overhead (which deflates the ratio).
  *
  * Usage: runMain graft.BenchMaint <sfDir>   (default scale/sf1.0)
  * Writes BENCH_MAINT.json (override via SPARK_GRAFT_BENCH_MAINT).
  */
object BenchMaint {

  private def fmt(v: Double): String = BigDecimal(v)
    .setScale(3, BigDecimal.RoundingMode.HALF_UP).toString

  private def timed[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  /** Bytes of parquet files present in `newDir` but not (by file name —
    * part names are UUID-unique, hard links carry the name) in `prevDir`:
    * what the commit PHYSICALLY wrote, as opposed to linked forward.
    */
  private def bytesNew(spark: SparkSession, prevDir: String, newDir: String): Long = {
    def names(d: String): Map[String, Long] =
      graft.ext.Compaction.dataFiles(spark, d).map { case (p, len) =>
        new org.apache.hadoop.fs.Path(p).getName -> len
      }.toMap
    val prev = names(prevDir).keySet
    names(newDir).collect { case (n, len) if !prev.contains(n) => len }.sum
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("scale/sf1.0")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .appName("graft-bench-maint").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val work = java.nio.file.Files.createTempDirectory("graft_maint").toString
    val steps = scala.collection.mutable.LinkedHashMap.empty[String, (Double, Long, Long)]
    def record(name: String, wall: Double, rows: Long, bytes: Long): Unit = {
      steps(name) = (wall, rows, bytes)
      System.err.println(s"[maint] $name wall=${fmt(wall)}s rows=$rows bytes=$bytes")
    }

    // ---- split: base 89% / 1% / 10% by ascending id (monotone feed —
    // the common case; the gate's anti-join path is spec-covered). ----
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val Array(d89, d90) = docs.stat.approxQuantile("doc_id", Array(0.89, 0.90), 0.0001)
    val baseDocs = docs.filter(col("doc_id") <= d89)
    val inc1Docs = docs.filter(col("doc_id") > d89 && col("doc_id") <= d90)
    val inc10Docs = docs.filter(col("doc_id") > d90)

    val docCorpus = s"$work/doc_corpus"
    baseDocs.write.mode(SaveMode.Overwrite).parquet(s"$docCorpus/documents.parquet")
    val nBase = spark.read.parquet(s"$docCorpus/documents.parquet").count()

    // ---- postings artifact: build vs append ----
    val postIdx = s"$work/postings_idx"
    val (_, buildWall) = timed {
      graft.ext.PostingsIndex.build(spark, docCorpus, postIdx)
    }
    record("postings_build", buildWall, nBase,
      bytesNew(spark, "/nonexistent", graft.ext.Versioned.committedDir(postIdx)))
    for ((inc, tag) <- Seq((inc1Docs, "1pct"), (inc10Docs, "10pct"))) {
      val prevVd = graft.ext.Versioned.committedDir(postIdx)
      val rows = inc.count()
      val (_, wall) = timed {
        graft.ext.PostingsIndex.appendDocs(spark, postIdx, inc)
      }
      record(s"postings_append_$tag", wall, rows,
        bytesNew(spark, prevVd, graft.ext.Versioned.committedDir(postIdx)))
    }

    // ---- contended maintenance (r14 VERDICT #6): a stream-shaped append
    // losing the CAS race to a scheduled append, under the retry
    // discipline. Deterministic interleave via the promote-entry hook —
    // the racer commits after the victim staged, so the victim pays one
    // full wasted staging and a retry. Reported: retries, the wasted
    // staged bytes (NEW bytes in the doomed dir — hard links excluded),
    // and the end-to-end wall for BOTH increments landing. The artifact
    // equality (raced schedule ≡ sequential schedule) is spec-pinned
    // (PostingsIndexSpec "STREAM batch racing a scheduled commit").
    val incA = inc1Docs.withColumn("doc_id", col("doc_id") + lit(1000000000L))
    val incB = inc1Docs.withColumn("doc_id", col("doc_id") + lit(2000000000L))
    val contRows = inc1Docs.count() * 2
    var wastedBytes = 0L
    var fired = false
    graft.ext.Versioned.beforePromote = (dir, v) => {
      if (!fired && dir == postIdx) {
        fired = true
        wastedBytes = bytesNew(spark, graft.ext.Versioned.committedDir(postIdx),
          graft.ext.Versioned.versionDir(postIdx, v))
        graft.ext.PostingsIndex.appendDocs(spark, postIdx, incB)
      }
    }
    val prevContVd = graft.ext.Versioned.committedDir(postIdx)
    val ((_, contRetries), contWall) = try timed {
      graft.ext.Versioned.retryingCommitCounted("bench-contended") {
        graft.ext.PostingsIndex.appendDocs(spark, postIdx, incA)
      }
    } finally graft.ext.Versioned.beforePromote = (_, _) => ()
    record("postings_append_contended", contWall, contRows,
      bytesNew(spark, prevContVd, graft.ext.Versioned.committedDir(postIdx)))
    System.err.println(
      s"[maint] contended: retries=$contRetries wasted_staged_bytes=$wastedBytes")

    // ---- ANN artifact: build vs drift-append (frozen model) ----
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val Array(v89, v90) = vecs.stat.approxQuantile("vec_id", Array(0.89, 0.90), 0.0001)
    val vecCorpus = s"$work/vec_corpus"
    vecs.filter(col("vec_id") <= v89)
      .write.mode(SaveMode.Overwrite).parquet(s"$vecCorpus/embeddings.parquet")
    val nVecBase = spark.read.parquet(s"$vecCorpus/embeddings.parquet").count()
    val annIdx = s"$work/ann_idx"
    val (_, annBuildWall) = timed {
      graft.ext.AnnIndex.save(spark, vecCorpus, annIdx)
    }
    record("ann_build", annBuildWall, nVecBase,
      bytesNew(spark, "/nonexistent", graft.ext.Versioned.committedDir(annIdx)))
    for ((lo, hi, tag) <- Seq((v89, v90, "1pct"), (v90, Double.MaxValue, "10pct"))) {
      val inc = vecs.filter(col("vec_id") > lo && col("vec_id") <= hi)
      val rows = inc.count()
      inc.write.mode(SaveMode.Append).parquet(s"$vecCorpus/embeddings.parquet")
      // In-place corpus mutation: the session-memo contract (ext.Currency
      // / queries.Det docs) — same discipline as AnnIndex.maintainStream.
      graft.ext.Currency.invalidate(vecCorpus)
      graft.queries.Det.releaseForDir(spark, vecCorpus)
      val prevVd = graft.ext.Versioned.committedDir(annIdx)
      val (rep, wall) = timed {
        graft.ext.AnnIndex.rebuildIfDrifted(spark, vecCorpus, annIdx)
      }
      require(rep.action == "appended",
        s"maintenance increment must take the frozen-model append path, got $rep")
      record(s"ann_append_$tag", wall, rows,
        bytesNew(spark, prevVd, graft.ext.Versioned.committedDir(annIdx)))
    }

    // ---- one full Publish (ingest → clean → serving + all artifacts)
    // over the base corpus re-serialized as a JSONL dump — the
    // end-to-end write path a scheduled job runs. Text-only (no
    // embeddings) keeps the measurement about the pipeline, not ANN
    // retraining already measured above.
    val dump = s"$work/dump"
    baseDocs.select(to_json(struct(
        col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars")))
        .as("value"))
      .write.mode(SaveMode.Overwrite).text(dump)
    val pubOut = s"$work/publish_out"
    val (pubReport, pubWall) = timed {
      graft.ext.Publish.run(spark, dump, pubOut)
    }
    record("publish_full", pubWall, pubReport.servingDocs, 0L)

    def w(name: String) = steps(name)._1
    val ratios = Seq(
      "postings_append10_over_append1" -> w("postings_append_10pct") / math.max(w("postings_append_1pct"), 1e-3),
      "postings_append1_over_build" -> w("postings_append_1pct") / math.max(w("postings_build"), 1e-3),
      "ann_append10_over_append1" -> w("ann_append_10pct") / math.max(w("ann_append_1pct"), 1e-3),
      "ann_append1_over_build" -> w("ann_append_1pct") / math.max(w("ann_build"), 1e-3))
    val stepJs = steps.map { case (n, (wall, rows, bytes)) =>
      s""""$n":{"wall":${fmt(wall)},"rows":$rows,"bytes_written":$bytes}"""
    }.mkString(",")
    val ratioJs = ratios.map { case (n, v) => s""""$n":${fmt(v)}""" }.mkString(",")
    val out = s"""{"metric":"maint_curve","sf_dir":"$sfDir","cpus":$cpus,"base_docs":$nBase,"base_vecs":$nVecBase,"steps":{$stepJs},"ratios":{$ratioJs},"contended":{"retries":$contRetries,"wasted_staged_bytes":$wastedBytes}}"""
    val path = sys.env.getOrElse("SPARK_GRAFT_BENCH_MAINT", "BENCH_MAINT.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(path),
      (out + "\n").getBytes("UTF-8"))
    catch { case e: Throwable => System.err.println(s"[maint] write failed: $e") }
    println(out)
    try graft.ext.Versioned.deleteRecursively(new java.io.File(work))
    catch { case _: Throwable => () }
    try spark.stop() catch { case _: Throwable => () }
  }
}
