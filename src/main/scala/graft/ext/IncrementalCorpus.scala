package graft.ext

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental corpus build — the daily-drop path: a NEW batch of
  * documents is cleaned and deduplicated against the STANDING corpus
  * without ever re-pairing old×old, and the standing state grows by
  * exactly the survivors. This is the operational shape of a crawl
  * pipeline at 100 TB: the full CorpusPipeline runs once to bootstrap;
  * every subsequent drop costs O(increment + collisions), never
  * O(corpus).
  *
  * Persisted dedup state under `stateDir`, VERSIONED (r11 VERDICT #3 —
  * the four-table append used to be non-atomic as a group, and the
  * per-drop appends grew the file count without bound):
  *
  *   stateDir/CURRENT     one line: the committed version number —
  *                        updated by ATOMIC rename, the only mutation
  *                        a reader can ever observe
  *   stateDir/v<N>/docs/      (doc_id, text, lang, source, n_chars)
  *   stateDir/v<N>/hashes/    (doc_id, content_hash)  — exact-dup index
  *   stateDir/v<N>/bands/     (doc_id, band)          — LSH bucket index
  *   stateDir/v<N>/shingles/  (doc_id, shingles)      — verify features
  *
  * A commit stages version N+1 completely — every table = HARD LINKS to
  * version N's immutable data files plus the increment's new files
  * appended (metadata-only reuse: the 100 TB standing corpus is never
  * rewritten; on an object store the links become a manifest, which is
  * exactly the Iceberg/Delta snapshot commit re-expressed on a plain
  * filesystem) — and only then flips CURRENT. A crash anywhere before
  * the flip leaves CURRENT at version N and the standing state fully
  * readable; the dead staging dir is swept by the next promote's
  * retention pass. Tables whose file count exceeds the compaction bound
  * are rewritten into few files DURING staging (Compaction's rebalance,
  * inside the not-yet-visible version dir), so a thousand drops cannot
  * rot scan planning with a thousand KB-sized files.
  *
  * hashes/bands are the persisted twins of the in-session derivations
  * (AnnIndex discipline applied to dedup): an increment reads them as
  * columnar scans instead of re-deriving O(corpus) signatures. shingles
  * ride along so the exact Jaccard verify of a new×old candidate never
  * re-reads old text. Bootstrap via `initState` from
  * any cleaned corpus (e.g. CorpusPipeline's corpus_clean output).
  *
  * Same operator definitions as the batch pipeline: the quality gate is
  * CorpusPipeline's stage-1 scoring, the near-dup rule is the verified
  * MinHash/LSH chain (3-token shingles, minhash_sig, 4 bands × 3 rows,
  * exact Jaccard ≥ threshold verify) — so batch-then-increment and
  * one-shot-batch agree on what counts as a duplicate, the property the
  * spec pins. Canonicalization assumes doc ids grow monotonically across
  * drops (new ids > standing ids — the crawl reality): a new doc with a
  * standing near-dup always loses to the standing copy, which is then
  * the min-id keeper a one-shot batch run would have chosen too.
  */
object IncrementalCorpus {

  final case class IncrCounts(newInput: Long, afterQuality: Long,
                              afterExact: Long, afterNear: Long,
                              standingBefore: Long, standingAfter: Long)

  private val StateTables = Seq("docs", "hashes", "bands", "shingles")

  // ---- versioned-state plumbing ----

  /** The committed version (0 = no state yet) — the shared snapshot
    * discipline (ext/Versioned, extracted from here at r13).
    */
  def currentVersion(stateDir: String): Long = Versioned.currentVersion(stateDir)

  def versionDir(stateDir: String, v: Long): String = Versioned.versionDir(stateDir, v)

  /** A state table at the committed version — the ONLY read path; no
    * caller ever touches a version dir that CURRENT does not name.
    */
  def stateTable(spark: SparkSession, stateDir: String, name: String): DataFrame = {
    val v = currentVersion(stateDir)
    require(v > 0, s"no committed incremental-corpus state under $stateDir")
    spark.read.parquet(s"${versionDir(stateDir, v)}/$name")
  }

  private[graft] def promote(stateDir: String, v: Long, expectedParent: Long): Unit =
    Versioned.promote(stateDir, v, 2, expectedParent)

  /** Stage version cur+1 WITHOUT committing: per table, hard-link the
    * committed version's parquet data files (copy where the filesystem
    * refuses links), append `adds(table)`, and compact in place if the
    * staged file count exceeds `compactFileBound`. Returns (staged
    * version, the committed parent it staged off) for the CAS `promote`
    * — a racing maintainer fails at the flip instead of publishing an
    * interleaving (r13 VERDICT #1). Exposed private[graft] so the spec
    * can kill a commit between staging and promotion. The compaction
    * runs INSIDE the not-yet-visible dir, so its own rm-then-move is
    * invisible to readers (unlike the pre-r13 PostingsIndex swap).
    */
  private[graft] def prepareAppend(spark: SparkSession, stateDir: String,
                                   adds: Map[String, DataFrame],
                                   compactFileBound: Int): (Long, Long) = {
    val cur = currentVersion(stateDir)
    val (newV, _) = Versioned.claimVersion(stateDir)
    for (t <- StateTables) {
      val dst = new java.io.File(versionDir(stateDir, newV), t)
      if (cur > 0)
        Versioned.linkTable(spark, s"${versionDir(stateDir, cur)}/$t", dst.toString)
      adds(t).write.mode(SaveMode.Append).parquet(dst.toString)
      if (Compaction.dataFiles(spark, dst.toString).size > compactFileBound) {
        val tmp = s"$dst.compacting"
        Compaction.compact(spark, dst.toString, tmp)
        Versioned.deleteRecursively(dst)
        java.nio.file.Files.move(java.nio.file.Paths.get(tmp), dst.toPath)
      }
    }
    (newV, cur)
  }

  private def shingled(docs: DataFrame): DataFrame = docs
    .withColumn("toks", split(col("text"), " "))
    .withColumn("shingles", expr(
      """CASE WHEN size(toks) >= 3
        |  THEN array_distinct(transform(sequence(1, size(toks) - 2),
        |                                i -> concat_ws(' ', slice(toks, i, 3))))
        |  ELSE CAST(array() AS ARRAY<STRING>) END""".stripMargin))
    .select(col("doc_id"), col("shingles"))

  private def bandsOf(shingles: DataFrame): DataFrame = shingles
    .withColumn("sig", expr("minhash_sig(shingles)"))
    .withColumn("bands", expr(
      "transform(sequence(0, 3), k -> md5(concat(CAST(k AS STRING), '|', sig[k*3], '|', sig[k*3+1], '|', sig[k*3+2])))"))
    .select(col("doc_id"), explode(col("bands")).as("band"))

  private def hashesOf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), md5(col("text")).as("content_hash"))

  /** Bootstrap the persisted state from an already-cleaned corpus:
    * stage version 1 completely, then commit (CURRENT appears last).
    */
  def initState(spark: SparkSession, cleanDocs: DataFrame, stateDir: String): Unit = {
    val docs = cleanDocs.select(col("doc_id"), col("text"), col("lang"),
      col("source"), col("n_chars"))
    val (v, parent) = Versioned.claimVersion(stateDir)
    val vd = versionDir(stateDir, v)
    docs.write.mode(SaveMode.Overwrite).parquet(s"$vd/docs")
    hashesOf(docs).write.mode(SaveMode.Overwrite).parquet(s"$vd/hashes")
    val sh = shingled(docs)
    sh.write.mode(SaveMode.Overwrite).parquet(s"$vd/shingles")
    bandsOf(sh).write.mode(SaveMode.Overwrite).parquet(s"$vd/bands")
    promote(stateDir, v, parent)
  }

  /** Clean `newDocs` against the standing state, append survivors, and
    * write the increment + audited drops under `outDir`:
    *   increment_clean/  the surviving new docs
    *   incr_dropped/     (doc_id, drop_reason, dup_of) for every loss
    */
  def runIncremental(spark: SparkSession, newDocs: DataFrame,
                     stateDir: String, outDir: String,
                     minQuality: Double = 0.5,
                     jaccardThreshold: Double = 0.8,
                     compactFileBound: Int = 64): IncrCounts = {
    val standing = stateTable(spark, stateDir, "docs")
    val standingBefore = standing.count()

    // 0+1. PII scrub + the batch pipeline's quality gate, on the new
    // batch only — per-row maps, O(increment).
    val scrubbed = newDocs
      .withColumn("text", graft.queries.TextOps.scrubPii(col("text")))
    val newInput = scrubbed.count()
    val scored = scrubbed
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n_tokens", size(col("toks")).cast("double"))
      .withColumn("uniq_ratio", size(array_distinct(col("toks"))) / col("n_tokens"))
      .withColumn("stop_ratio", expr(
        "size(filter(toks, t -> t IN ('the', 'a', 'of', 'and', 'to', 'in')))") / col("n_tokens"))
      .withColumn("quality_score",
        lit(0.3) * least(col("n_tokens") / 100.0, lit(1.0))
          + lit(0.4) * col("uniq_ratio")
          + lit(0.3) * (lit(1.0) - col("stop_ratio")))
    val qualityDrops = scored.filter(col("quality_score") < minQuality)
      .select(col("doc_id"), lit("quality_below_min").as("drop_reason"),
        lit(null).cast("long").as("dup_of"))
    // Caches are owned LOCALLY (persist/unpersist inside this call, not
    // Det.pin): every output is landed to parquet before return, so
    // nothing outlives the call — and the streaming wrapper must not
    // release the enclosing session's pins from inside foreachBatch.
    val quality = scored.filter(col("quality_score") >= minQuality)
      .select(newDocs.columns.map(col).toSeq: _*).persist()
    val afterQuality = quality.count()

    // 2. exact dedup: against the standing hash index (columnar scan of
    // the persisted artifact — old text is never read), then min-id
    // within the batch.
    val oldHashes = stateTable(spark, stateDir, "hashes")
      .select(col("content_hash")).distinct()
    val hashed = quality.withColumn("content_hash", md5(col("text")))
    val vsOld = hashed.join(oldHashes, Seq("content_hash"), "left_anti")
    val exactKeep = vsOld
      .withColumn("__keeper", min(col("doc_id")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("content_hash"))))
      .filter(col("doc_id") === col("__keeper"))
      .drop("content_hash", "__keeper")
    val exact = exactKeep.persist()
    val afterExact = exact.count()
    val exactDrops = quality.select(col("doc_id"))
      .join(exact.select(col("doc_id")), Seq("doc_id"), "left_anti")
      .select(col("doc_id"), lit("exact_dup").as("drop_reason"),
        lit(null).cast("long").as("dup_of"))

    // 3. near dedup: new bands join OLD bands (bucketed, never all-pairs)
    // plus new×new within the batch; candidates exact-verified on
    // shingles (old side from the persisted shingle table). A new doc
    // with ANY verified neighbor — standing or smaller-id batch-mate —
    // drops; old×old pairs never form.
    val newSh = shingled(exact).persist()
    val newBands = bandsOf(newSh)
    val oldBands = stateTable(spark, stateDir, "bands")
      .select(col("doc_id").as("other"), col("band"))
    val candOld = newBands.join(oldBands, "band")
      .select(col("doc_id"), col("other")).distinct()
    val candNew = newBands.as("a").join(newBands.as("b"),
        col("a.band") === col("b.band") && col("a.doc_id") > col("b.doc_id"))
      .select(col("a.doc_id").as("doc_id"), col("b.doc_id").as("other"))
      .distinct()
    val oldSh = stateTable(spark, stateDir, "shingles")
      .select(col("doc_id").as("o2"), col("shingles").as("sh_b"))
    val newShB = newSh.select(col("doc_id").as("o2"), col("shingles").as("sh_b"))
    val cand = candOld.union(candNew)
    val verified = cand
      .join(newSh.select(col("doc_id"), col("shingles").as("sh_a")), "doc_id")
      .join(oldSh.union(newShB), cand("other") === col("o2"))
      .withColumn("inter", expr("CAST(size(array_intersect(sh_a, sh_b)) AS DOUBLE)"))
      .filter(col("inter") /
        (size(col("sh_a")) + size(col("sh_b")) - col("inter")) >= jaccardThreshold)
    val nearDrops = verified.groupBy(col("doc_id"))
      .agg(min(col("other")).as("dup_of"))
      .select(col("doc_id"), lit("near_dup").as("drop_reason"), col("dup_of"))
    val survivors = exact.join(nearDrops.select(col("doc_id")), Seq("doc_id"), "left_anti")
    val afterNear = survivors.count()

    // 4. land the increment + audit, then commit the grown state as ONE
    // new version: stage (links + appends + compaction) completely,
    // promote atomically. A kill anywhere in staging leaves CURRENT —
    // and every reader — at the prior version.
    survivors.write.mode(SaveMode.Overwrite).parquet(s"$outDir/increment_clean")
    qualityDrops.unionByName(exactDrops).unionByName(nearDrops)
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/incr_dropped")
    val landed = spark.read.parquet(s"$outDir/increment_clean")
    val landedSh = shingled(landed)
    val (newV, parentV) = prepareAppend(spark, stateDir, Map(
      "docs" -> landed,
      "hashes" -> hashesOf(landed),
      "shingles" -> landedSh,
      "bands" -> bandsOf(landedSh)), compactFileBound)
    promote(stateDir, newV, parentV)
    val standingAfter = stateTable(spark, stateDir, "docs").count()

    quality.unpersist(blocking = false)
    exact.unpersist(blocking = false)
    newSh.unpersist(blocking = false)
    IncrCounts(newInput, afterQuality, afterExact, afterNear,
      standingBefore, standingAfter)
  }

  /** Streaming form: crawl drops land as parquet files under
    * `sourceDir`; each micro-batch runs the SAME incremental build
    * against the persisted state (foreachBatch — the batch operators
    * unchanged, so stream-ingested corpora and hand-run increments are
    * governed by identical dedup semantics). Each batch's increment +
    * audit lands under `outRoot/batch_<id>`; the state dir is the
    * cross-batch memory, so a doc arriving in batch N that duplicates a
    * batch N−1 survivor dies exactly like a same-batch duplicate.
    * Sequential micro-batches are the correctness assumption (Spark
    * guarantees in-order foreachBatch within a query); the per-batch
    * counts log to `outRoot/batch_<id>/counts` for the audit trail.
    */
  def incrementalStream(spark: SparkSession, sourceDir: String,
                        stateDir: String, outRoot: String,
                        maxFilesPerTrigger: Option[Int] = None)
  : org.apache.spark.sql.streaming.StreamingQuery = {
    val reader = spark.readStream.schema(graft.streaming.EventStream.docSchema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    reader.parquet(sourceDir).writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val out = s"$outRoot/batch_$batchId"
          // A micro-batch losing the CAS to a concurrent maintainer
          // re-runs the whole pass off the winner's committed state
          // (the same retry discipline as postingsStream — r14 #1).
          val c = Versioned.retryingCommit("incremental-corpus-stream") {
            runIncremental(spark, batch, stateDir, out)
          }
          import spark.implicits._
          Seq((batchId, c.newInput, c.afterQuality, c.afterExact,
            c.afterNear, c.standingAfter))
            .toDF("batch_id", "new_input", "after_quality", "after_exact",
              "after_near", "standing_after")
            .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$out/counts")
        }
      }
      .start()
  }
}
