package graft

import org.apache.spark.sql.functions._
import graft.ext.IncrementalCorpus

/** Incremental corpus build: a new drop cleaned against the standing
  * state at O(increment) cost, every loss audited, state growing by
  * exactly the survivors — and batch-then-increment ≡ one-shot batch on
  * the union (the agreement property that makes "incremental" a cost
  * optimization, not a semantics change).
  */
class IncrementalCorpusSpec extends SparkSpec {
  import spark.implicits._

  private def mkDocs(rows: Seq[(Long, String)]) =
    rows.map { case (id, t) => (id, t, "en", "s0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  private def freshText(tag: String): String =
    (0 until 40).map(i => s"${tag}w$i").mkString(" ")

  /** ~0.9-Jaccard variant: swap the last token of a 40-token doc. */
  private def nearVariant(tag: String): String =
    ((0 until 39).map(i => s"${tag}w$i") :+ "changed").mkString(" ")

  test("increment dedups against standing state; every loss audited; state grows by survivors") {
    val stateDir = java.nio.file.Files.createTempDirectory("incr_state").toString
    val outDir = java.nio.file.Files.createTempDirectory("incr_out").toString
    val standing = mkDocs(Seq(1L -> freshText("a"), 2L -> freshText("b")))
    IncrementalCorpus.initState(spark, standing, stateDir)
    val newBatch = mkDocs(Seq(
      10L -> freshText("a"),            // exact dup of standing doc 1
      11L -> nearVariant("b"),          // near dup of standing doc 2
      12L -> freshText("c"),            // unique — survives
      13L -> freshText("c"),            // exact dup WITHIN the batch of 12
      14L -> nearVariant("c"),          // near dup within batch of 12
      15L -> "the the the the the the", // stopword soup — quality drop
      16L -> freshText("d")))           // unique — survives
    val r = IncrementalCorpus.runIncremental(spark, newBatch, stateDir, outDir)
    assert(r.newInput == 7 && r.afterQuality == 6, s"quality gate: $r")
    assert(r.afterExact == 4, s"exact kills 10 (vs standing) and 13 (in batch): $r")
    assert(r.afterNear == 2, s"near kills 11 (vs standing) and 14 (in batch): $r")
    assert(r.standingBefore == 2 && r.standingAfter == 4, s"state grows by survivors: $r")
    val kept = spark.read.parquet(s"$outDir/increment_clean")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(12L, 16L), s"survivors: $kept")
    val drops = spark.read.parquet(s"$outDir/incr_dropped")
      .collect().map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[String]("drop_reason"), Option(x.getAs[java.lang.Long]("dup_of")))).toMap
    assert(drops.keySet == Set(10L, 11L, 13L, 14L, 15L))
    assert(drops(15L)._1 == "quality_below_min")
    assert(drops(10L)._1 == "exact_dup" && drops(13L)._1 == "exact_dup")
    assert(drops(11L) == ("near_dup", Some(2L)), s"near-dup of standing doc 2: ${drops(11L)}")
    assert(drops(14L) == ("near_dup", Some(12L)), s"near-dup of batch-mate 12: ${drops(14L)}")
    graft.queries.Det.releasePins(spark)
  }

  test("batch-then-increment equals one-shot batch on the union (agreement property)") {
    val stateDir = java.nio.file.Files.createTempDirectory("incr_state2").toString
    val outDir = java.nio.file.Files.createTempDirectory("incr_out2").toString
    val oldRows = Seq(1L -> freshText("p"), 2L -> freshText("q"), 3L -> freshText("r"))
    val newRows = Seq(
      20L -> nearVariant("p"),  // loses to standing 1
      21L -> freshText("q"),    // exact dup of standing 2
      22L -> freshText("s"),    // unique
      23L -> nearVariant("s"))  // loses to batch-mate 22
    IncrementalCorpus.initState(spark, mkDocs(oldRows), stateDir)
    IncrementalCorpus.runIncremental(spark, mkDocs(newRows), stateDir, outDir)
    val incremental = IncrementalCorpus.stateTable(spark, stateDir, "docs")
      .select("doc_id").as[Long].collect().toSet
    graft.queries.Det.releasePins(spark)
    // One-shot batch over the union, same operators: exact min-id keep,
    // then drop docs with a verified smaller-id near-dup.
    val union = mkDocs(oldRows ++ newRows)
    val exact = union
      .withColumn("h", md5(col("text")))
      .withColumn("k", min(col("doc_id")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("h"))))
      .filter(col("doc_id") === col("k")).drop("h", "k")
    val pairs = graft.ext.CorpusPipeline.nearDupPairs(spark, exact, 0.8)
    val losers = pairs.select(col("doc_b")).as[Long].collect().toSet
    val oneShot = exact.select("doc_id").as[Long].collect().toSet -- losers
    assert(incremental == oneShot,
      s"batch-then-increment $incremental != one-shot $oneShot")
    graft.queries.Det.releasePins(spark)
  }

  test("streaming drops: cross-batch dedup against the growing state") {
    import java.nio.file.{Files, Paths}
    val stateDir = Files.createTempDirectory("incr_state_s").toString
    val outRoot = Files.createTempDirectory("incr_out_s").toString
    val srcDir = Files.createTempDirectory("incr_src_s")
    IncrementalCorpus.initState(spark, mkDocs(Seq(1L -> freshText("m"))), stateDir)
    // Batch 0: one unique + one near-dup of standing; batch 1: an exact
    // dup of batch 0's survivor (cross-batch — only the state can see it)
    // + one unique. mod-time staggered so the file source orders them.
    def stage(name: String, df: org.apache.spark.sql.DataFrame, offSec: Long): Unit = {
      import java.nio.file.{Files => F, StandardCopyOption}
      import java.nio.file.attribute.FileTime
      val tmp = F.createTempDirectory(s"incr_stage_$name").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
      val dst = srcDir.resolve(s"$name.parquet")
      F.move(part.toPath, dst, StandardCopyOption.REPLACE_EXISTING)
      F.setLastModifiedTime(dst,
        FileTime.fromMillis(System.currentTimeMillis() - 60000 + offSec * 1000))
    }
    stage("d0", mkDocs(Seq(50L -> freshText("n"), 51L -> nearVariant("m"))), 0)
    stage("d1", mkDocs(Seq(60L -> freshText("n"), 61L -> freshText("o"))), 10)
    val q = IncrementalCorpus.incrementalStream(
      spark, srcDir.toString, stateDir, outRoot, maxFilesPerTrigger = Some(1))
    q.processAllAvailable(); q.stop()
    val standing = IncrementalCorpus.stateTable(spark, stateDir, "docs")
      .select("doc_id").as[Long].collect().toSet
    assert(standing == Set(1L, 50L, 61L),
      s"51 near-dups standing 1; 60 exact-dups batch-0 survivor 50: $standing")
    // Per-batch audit landed.
    val batchDirs = new java.io.File(outRoot).listFiles()
      .filter(_.getName.startsWith("batch_")).map(_.getName).sorted
    assert(batchDirs.length == 2, s"two micro-batches: ${batchDirs.toSeq}")
    assert(Files.exists(Paths.get(s"$outRoot/${batchDirs.head}/counts")))
  }

  test("a killed commit leaves the state readable at the prior version (atomic promote)") {
    val stateDir = java.nio.file.Files.createTempDirectory("incr_state_k").toString
    val outDir = java.nio.file.Files.createTempDirectory("incr_out_k").toString
    IncrementalCorpus.initState(spark,
      mkDocs(Seq(1L -> freshText("g"), 2L -> freshText("h"))), stateDir)
    val vBefore = IncrementalCorpus.currentVersion(stateDir)
    // Simulate the crash window: stage the whole next version (all four
    // tables linked + appended) but die before promote.
    val batch = mkDocs(Seq(70L -> freshText("i")))
    val (staged, _) = IncrementalCorpus.prepareAppend(spark, stateDir, Map(
      "docs" -> batch,
      "hashes" -> batch.select(col("doc_id"), md5(col("text")).as("content_hash")),
      "shingles" -> batch.select(col("doc_id"),
        split(col("text"), " ").as("shingles")),
      "bands" -> batch.select(col("doc_id"), md5(col("text")).as("band"))),
      compactFileBound = 64)
    assert(staged > vBefore)
    // Readers still see the prior version, doc 70 invisible.
    assert(IncrementalCorpus.currentVersion(stateDir) == vBefore)
    assert(IncrementalCorpus.stateTable(spark, stateDir, "docs")
      .select("doc_id").as[Long].collect().toSet == Set(1L, 2L))
    // The NEXT real increment works on top of the prior version and its
    // commit sweeps the dead staging dir.
    val r = IncrementalCorpus.runIncremental(spark,
      mkDocs(Seq(80L -> freshText("j"))), stateDir, outDir)
    assert(r.standingAfter == 3)
    assert(IncrementalCorpus.stateTable(spark, stateDir, "docs")
      .select("doc_id").as[Long].collect().toSet == Set(1L, 2L, 80L),
      "the dead staging dir's rows must never surface")
    assert(!new java.io.File(IncrementalCorpus.versionDir(stateDir, staged)).exists(),
      "promote must sweep the abandoned staging dir")
    graft.queries.Det.releasePins(spark)
  }

  test("N drops then compaction ≡ uncompacted state (content identical, file count bounded)") {
    val always = java.nio.file.Files.createTempDirectory("incr_state_ca").toString
    val never = java.nio.file.Files.createTempDirectory("incr_state_cn").toString
    for (d <- Seq(always, never))
      IncrementalCorpus.initState(spark, mkDocs(Seq(1L -> freshText("z0"))), d)
    for (i <- 1 to 4) {
      val drop = mkDocs(Seq(
        (100L * i) -> freshText(s"z$i"), (100L * i + 1) -> freshText(s"y$i")))
      IncrementalCorpus.runIncremental(spark, drop,
        always, java.nio.file.Files.createTempDirectory(s"incr_oca$i").toString,
        compactFileBound = 1)
      IncrementalCorpus.runIncremental(spark, drop,
        never, java.nio.file.Files.createTempDirectory(s"incr_ocn$i").toString,
        compactFileBound = 1000000)
    }
    for (t <- Seq("docs", "hashes", "bands", "shingles")) {
      val a = IncrementalCorpus.stateTable(spark, always, t)
        .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
      val n = IncrementalCorpus.stateTable(spark, never, t)
        .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
      assert(a == n, s"compacted state table $t diverged from uncompacted")
    }
    val vA = IncrementalCorpus.currentVersion(always)
    val docsFiles = graft.ext.Compaction.dataFiles(spark,
      s"${IncrementalCorpus.versionDir(always, vA)}/docs")
    assert(docsFiles.size <= 1,
      s"bound-1 compaction must leave ≤1 file, got ${docsFiles.size}")
    graft.queries.Det.releasePins(spark)
  }

  test("a second identical drop is fully deduped (idempotence) and state is unchanged") {
    val stateDir = java.nio.file.Files.createTempDirectory("incr_state3").toString
    val out1 = java.nio.file.Files.createTempDirectory("incr_out3a").toString
    val out2 = java.nio.file.Files.createTempDirectory("incr_out3b").toString
    IncrementalCorpus.initState(spark, mkDocs(Seq(1L -> freshText("x"))), stateDir)
    val drop = mkDocs(Seq(30L -> freshText("y"), 31L -> freshText("z")))
    val r1 = IncrementalCorpus.runIncremental(spark, drop, stateDir, out1)
    assert(r1.afterNear == 2 && r1.standingAfter == 3)
    // Same content, new ids — everything must die as exact dups.
    val replay = mkDocs(Seq(40L -> freshText("y"), 41L -> freshText("z")))
    val r2 = IncrementalCorpus.runIncremental(spark, replay, stateDir, out2)
    assert(r2.afterExact == 0 && r2.afterNear == 0, s"replay must fully dedup: $r2")
    assert(r2.standingAfter == 3, s"state unchanged on a no-op drop: $r2")
    graft.queries.Det.releasePins(spark)
  }
}
