package graft

import org.apache.spark.sql.functions._
import graft.streaming.EventStream

/** Streaming ≡ batch equivalence: the Structured Streaming pipelines must
  * produce exactly the batch semantics on a bounded source.
  */
class StreamingSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private lazy val sourceDir = {
    val d = java.nio.file.Files.createTempDirectory("events_src").toString
    Tables.events(spark, sfDir).repartition(8).write.mode("overwrite").parquet(d)
    d
  }

  test("streaming mixture monitor converges to the batch mixture report") {
    val docsDir = java.nio.file.Files.createTempDirectory("docs_src").toString
    Tables.documents(spark, sfDir).repartition(4).write.mode("overwrite").parquet(docsDir)
    // 4 files, one per micro-batch: the final complete-mode emission must
    // equal the batch aggregation over everything that has landed.
    val streamed = EventStream.runMixtureMonitor(spark, docsDir, "mix_test",
      maxFilesPerTrigger = Some(1))
    val batch = Tables.documents(spark, sfDir)
      .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("total_tokens"))
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch.select(streamed.columns.map(col).toSeq: _*)).count() == 0)
  }

  test("streaming tumbling window equals batch groupBy(window)") {
    val streamed = EventStream.runWindowed(spark, sourceDir, "win_test")
      .select(col("window_start"), col("event_type"), col("n_events"))
    val batch = Tables.events(spark, sfDir)
      .groupBy(window(col("ts"), "1 hour")("start").as("window_start"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch.select(streamed.columns.map(col).toSeq: _*)).count() == 0)
  }

  test("streaming sliding window equals batch groupBy(window(len, slide))") {
    import org.apache.spark.sql.streaming.OutputMode
    val q = spark.readStream.schema(EventStream.eventSchema).parquet(sourceDir)
      .withWatermark("ts", "1 hour")
      // Group by the full window struct so the event-time watermark metadata
      // stays attached to the aggregate; project window.start afterwards.
      .groupBy(window(col("ts"), "1 hour", "15 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"), col("n_events"))
      .writeStream.format("memory").queryName("slide_test")
      .outputMode(OutputMode.Complete()).start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("slide_test")
    val batch = Tables.events(spark, sfDir)
      .groupBy(window(col("ts"), "1 hour", "15 minutes")("start").as("window_start"))
      .agg(count(lit(1)).as("n_events"))
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).count() == 0)
  }

  test("streaming MinHash near-dup detects every batch-verified pair") {
    import graft.queries.{Dedup, Det}
    // Stage the documents table as a bounded stream source.
    val docsSrc = java.nio.file.Files.createTempDirectory("docs_src").toString
    Tables.documents(spark, sfDir).repartition(4).write.mode("overwrite").parquet(docsSrc)
    val streamed = EventStream.runNearDupPairsStream(spark, docsSrc, "neardup_test")
      .select(col("doc_a"), col("doc_b")).distinct() // band collisions emit at-least-once
    // STRUCTURAL containment, not a corpus property: the batch operator's
    // candidate set is exactly the band-collision pairs, and the stream
    // emits every band collision (no estimate threshold), so any
    // batch-verified pair is necessarily detected unless its bucket
    // evicted (maxDocsPerBand default far exceeds this corpus's buckets).
    val batch = Dedup.queries("q_dedup_minhash")(spark, sfDir)
      .select(col("doc_a"), col("doc_b"))
    val missed = batch.exceptAll(streamed).count()
    assert(missed == 0, s"$missed batch-verified near-dup pairs not detected by the stream")
    assert(streamed.count() >= batch.count())
    Det.releasePins(spark)
  }

  test("streaming incremental dedup groups equal batch dedupGroups, cross-batch") {
    import graft.queries.{Dedup, Det}
    val docsSrc = java.nio.file.Files.createTempDirectory("docs_groups_src").toString
    Tables.documents(spark, sfDir).repartition(4).write.mode("overwrite").parquet(docsSrc)
    val workDir = java.nio.file.Files.createTempDirectory("groups_work").toString
    // maxFilesPerTrigger=1 → 4 micro-batches: the standing labels must be
    // maintained INCREMENTALLY (each batch's fixpoint sees only the
    // previous labels as contraction edges + that batch's verified
    // pairs), including merges when a later batch's edge bridges two
    // already-labeled components. Equivalence is structural: the stream
    // detects every band collision the batch operator forms (containment
    // test above), applies the identical exact-Jaccard gate, and
    // component min-labels are invariant under contraction.
    val streamed = EventStream.runDedupGroupsStream(spark, docsSrc, workDir,
      maxFilesPerTrigger = Some(1))
    val batch = Dedup.queries("q_dedup_groups")(spark, sfDir)
    assert(streamed.count() == batch.count(),
      s"stream holds ${streamed.count()} labeled docs, batch ${batch.count()}")
    assert(streamed.exceptAll(batch.select(streamed.columns.map(col).toSeq: _*)).count() == 0,
      "stream-maintained labels diverge from the batch dedupGroups labels")
    Det.releasePins(spark)
  }

  test("dedup groups stream at volume: 10k docs, 3k planted pairs, half merging cross-batch") {
    import graft.queries.Det
    // 3000 identical-text pairs (doc p ↔ doc p+10000) + 4000 unique
    // docs. Pairs 0..1499 land entirely in batch 1 (intra-batch
    // detection + first standing labels); pairs 1500..2999 split across
    // the batches, so batch 2 must merge against 1500 standing labels
    // while adding 1500 new edges — the incremental shape at a size
    // where an accidental all-pairs or full-relabel would visibly blow
    // up. Unique docs must stay unlabeled (groups hold ONLY paired docs).
    def text(pCol: org.apache.spark.sql.Column) = expr(
      s"concat_ws(' ', transform(sequence(0, 7), j -> concat('t', CAST(${pCol.toString} AS STRING), 'x', CAST(j AS STRING))))")
    val pairsA = spark.range(0, 3000).select(col("id").as("doc_id"), text(col("id")).as("text"))
    val pairsB = spark.range(0, 3000).select((col("id") + 10000).as("doc_id"), text(col("id")).as("text"))
    val uniques = spark.range(20000, 24000)
      .select(col("id").as("doc_id"), text(col("id")).as("text"))
    val watched = java.nio.file.Files.createTempDirectory("docs_groups_volume")
    val workDir = java.nio.file.Files.createTempDirectory("groups_volume_work").toString
    def docsOf(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("lang", lit("en")).withColumn("source", lit("src0"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    stageFile(watched, "batch1",
      docsOf(pairsA.union(pairsB.filter(col("doc_id") < 11500)).union(uniques.filter(col("doc_id") < 22000))), 0)
    stageFile(watched, "batch2",
      docsOf(pairsB.filter(col("doc_id") >= 11500).union(uniques.filter(col("doc_id") >= 22000))), 30)
    val groups = EventStream.runDedupGroupsStream(spark, watched.toString, workDir,
      maxFilesPerTrigger = Some(1)).collect()
    assert(groups.length == 6000, s"expected 6000 labeled docs, got ${groups.length}")
    assert(groups.forall(_.getAs[Long]("group_size") == 2L), "every planted group has exactly 2 docs")
    assert(groups.forall { r =>
      val (doc, grp) = (r.getAs[Long]("doc_id"), r.getAs[Long]("group_id"))
      grp == (doc % 10000) && doc < 20000
    }, "each pair labels to its min id; no unique doc labeled")
    Det.releasePins(spark)
  }

  test("dedup groups stream: restart from checkpoint resumes, merges across restarts") {
    import graft.queries.{Dedup, Det}
    // Phase 1 processes the even half of the corpus and STOPS; phase 2
    // starts a NEW query on the same checkpoints after the odd half
    // lands. The restart must resume from the source offsets (not
    // re-verify phase-1 edges) and phase-2 edges must merge INTO the
    // phase-1 standing labels — including components that only connect
    // through a phase-2 doc. Final labels ≡ batch over the whole corpus.
    val docs = Tables.documents(spark, sfDir)
    val watched = java.nio.file.Files.createTempDirectory("docs_groups_restart")
    val workDir = java.nio.file.Files.createTempDirectory("groups_restart_work").toString
    stageFile(watched, "evens", docs.filter(col("doc_id") % 2 === 0), 0)
    EventStream.runDedupGroupsStream(spark, watched.toString, workDir)
    stageFile(watched, "odds", docs.filter(col("doc_id") % 2 =!= 0), 30)
    val streamed = EventStream.runDedupGroupsStream(spark, watched.toString, workDir)
    val batch = Dedup.queries("q_dedup_groups")(spark, sfDir)
    assert(streamed.count() == batch.count(),
      s"after restart stream holds ${streamed.count()} labeled docs, batch ${batch.count()}")
    assert(streamed.exceptAll(batch.select(streamed.columns.map(col).toSeq: _*)).count() == 0,
      "post-restart labels diverge from the batch dedupGroups labels")
    Det.releasePins(spark)
  }

  test("reconciliation sweep repairs an evicted-bucket near-dup miss") {
    import spark.implicits._
    // Adversarial corpus, built with the engine's own minhash so the
    // scenario is deterministic-by-construction:
    //   A (doc 1)  — 30 tokens a0..a29.
    //   B (doc 50) — A with tokens 14,15 replaced → jaccard(A,B) = 24/32
    //                = 0.75 (below the 0.8 gate), SEARCHED so that every
    //                band of B equals the corresponding band of A: with
    //                maxDocsPerBand=1 B evicts A from ALL of A's buckets.
    //   C (doc 2)  — A with the last token replaced → jaccard(A,C) =
    //                27/29 ≈ 0.93 (a true near-dup), sharing ≥1 band
    //                with A (searched), so the BATCH LSH pairs them.
    //   E,F (100,101) — identical docs the stream itself verifies, so
    //                the sweep must MERGE into standing labels, not
    //                rebuild from nothing.
    // Arrival A|E, B|F, C: when C arrives, every bucket where it could
    // have met A holds only B (same band values), so the stream can
    // never pair (A,C) — the eviction residual the sweep repairs.
    val aToks = (0 until 30).map(i => s"a$i").toVector
    def bText(s: Int) = aToks.updated(14, s"b${s}p").updated(15, s"b${s}q").mkString(" ")
    def cText(s: Int) = aToks.updated(29, s"c$s").mkString(" ")
    val cands = Seq((1L, aToks.mkString(" "))) ++
      (0 until 300).map(s => (1000L + s, bText(s))) ++
      (0 until 10).map(s => (2000L + s, cText(s)))
    val bandsByDoc = cands.toDF("doc_id", "text")
      .withColumn("toks", split(col("text"), " "))
      .withColumn("shingles", expr(EventStream.shinglesSql))
      .withColumn("sig", expr("minhash_sig(shingles)"))
      .select(col("doc_id"), expr(EventStream.bandsSql).as("bands"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toVector).toMap
    val aBands = bandsByDoc(1L)
    val bSeed = (0 until 300).find(s => bandsByDoc(1000L + s) == aBands)
    assert(bSeed.isDefined, "no all-band collider below the jaccard gate in 300 candidates")
    val cSeed = (0 until 10).find(s => bandsByDoc(2000L + s).exists(aBands.contains))
    assert(cSeed.isDefined, "no near-dup variant sharing a band with A in 10 candidates")

    def docsOf(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("src0"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val eText = (0 until 20).map(i => s"e$i").mkString(" ")
    val watched = java.nio.file.Files.createTempDirectory("docs_sweep_src")
    val workDir = java.nio.file.Files.createTempDirectory("sweep_work").toString
    stageFile(watched, "b1", docsOf(Seq(1L -> aToks.mkString(" "), 100L -> eText)), 0)
    stageFile(watched, "b2", docsOf(Seq(50L -> bText(bSeed.get), 101L -> eText)), 10)
    stageFile(watched, "b3", docsOf(Seq(2L -> cText(cSeed.get))), 20)

    val pre = EventStream.runDedupGroupsStream(spark, watched.toString, workDir,
      maxFilesPerTrigger = Some(1), maxDocsPerBand = 1).collect()
    assert(pre.map(_.getAs[Long]("doc_id")).toSet == Set(100L, 101L),
      s"stream alone must hold only the E/F group (A–C missed): ${pre.toSeq}")

    def groupSet(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("group_id"),
        r.getAs[Long]("group_size"))).toSet
    val post = EventStream.reconcileGroupsSweep(spark, watched.toString, workDir).collect()
    assert(groupSet(post) ==
      Set((1L, 1L, 2L), (2L, 1L, 2L), (100L, 100L, 2L), (101L, 100L, 2L)),
      s"sweep must add the A–C group and keep E/F: ${post.toSeq}")

    // Repaired labels ≡ batch connected components over the full corpus.
    val (batchLabels, _) = graft.queries.Dedup.connectedComponents(
      EventStream.batchNearDupEdges(spark, watched.toString))
    val batchSet = batchLabels.collect()
      .map(r => (r.getAs[Long]("doc"), r.getAs[Long]("lbl"))).toSet
    assert(post.map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("group_id"))).toSet
      == batchSet, "post-sweep labels diverge from batch components")

    // Idempotence: a second sweep with no new documents changes nothing —
    // the anti-join keeps the edge log a set and the fast path skips the
    // label rewrite.
    val logN = spark.read.parquet(s"$workDir/edges").count()
    assert(logN == 2L, s"edge log must hold exactly (A,C) and (E,F): $logN rows")
    val post2 = EventStream.reconcileGroupsSweep(spark, watched.toString, workDir).collect()
    assert(groupSet(post2) == groupSet(post))
    assert(spark.read.parquet(s"$workDir/edges").count() == logN,
      "second sweep must not re-append logged edges")
  }

  test("scheduled in-stream sweep repairs the eviction miss with no manual call") {
    import spark.implicits._
    // Same adversarial corpus as the manual-sweep test (A evicted from
    // every bucket by the searched below-gate collider B, so the stream
    // can never pair A with its true near-dup C) — but here the stream
    // itself is started with sweepEveryBatches=Some(3): three staged
    // files at maxFilesPerTrigger=1 give batch ids 0,1,2, and the third
    // batch (the one that delivers C) triggers the reconciliation sweep
    // from inside foreachBatch. The A–C group must be in the standing
    // labels when the stream drains, without reconcileGroupsSweep ever
    // being called by the operator.
    val aToks = (0 until 30).map(i => s"a$i").toVector
    def bText(s: Int) = aToks.updated(14, s"b${s}p").updated(15, s"b${s}q").mkString(" ")
    def cText(s: Int) = aToks.updated(29, s"c$s").mkString(" ")
    val cands = Seq((1L, aToks.mkString(" "))) ++
      (0 until 300).map(s => (1000L + s, bText(s))) ++
      (0 until 10).map(s => (2000L + s, cText(s)))
    val bandsByDoc = cands.toDF("doc_id", "text")
      .withColumn("toks", split(col("text"), " "))
      .withColumn("shingles", expr(EventStream.shinglesSql))
      .withColumn("sig", expr("minhash_sig(shingles)"))
      .select(col("doc_id"), expr(EventStream.bandsSql).as("bands"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toVector).toMap
    val aBands = bandsByDoc(1L)
    val bSeed = (0 until 300).find(s => bandsByDoc(1000L + s) == aBands)
    assert(bSeed.isDefined, "no all-band collider below the jaccard gate in 300 candidates")
    val cSeed = (0 until 10).find(s => bandsByDoc(2000L + s).exists(aBands.contains))
    assert(cSeed.isDefined, "no near-dup variant sharing a band with A in 10 candidates")

    def docsOf(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("src0"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val eText = (0 until 20).map(i => s"e$i").mkString(" ")
    val watched = java.nio.file.Files.createTempDirectory("docs_sched_src")
    val workDir = java.nio.file.Files.createTempDirectory("sched_work").toString
    stageFile(watched, "b1", docsOf(Seq(1L -> aToks.mkString(" "), 100L -> eText)), 0)
    stageFile(watched, "b2", docsOf(Seq(50L -> bText(bSeed.get), 101L -> eText)), 10)
    stageFile(watched, "b3", docsOf(Seq(2L -> cText(cSeed.get))), 20)

    val groups = EventStream.runDedupGroupsStream(spark, watched.toString, workDir,
      maxFilesPerTrigger = Some(1), maxDocsPerBand = 1,
      sweepEveryBatches = Some(3)).collect()
    val got = groups.map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("group_id"),
      r.getAs[Long]("group_size"))).toSet
    assert(got == Set((1L, 1L, 2L), (2L, 1L, 2L), (100L, 100L, 2L), (101L, 100L, 2L)),
      s"in-stream sweep must have repaired the A-C miss by drain time: ${groups.toSeq}")
    graft.queries.Det.releasePins(spark)
  }

  test("sweep repairs labels left stale by a crash between edge append and label write") {
    import spark.implicits._
    // ADVICE r8: a crash AFTER a sweep/batch appended its verified edges
    // to the log but BEFORE the label overwrite leaves labelsExist=true
    // while the log holds a merge the labels never saw. Those edges are
    // already logged, so the replayed sweep's anti-join reports nothing
    // fresh — the old fast path (hasFresh || !labelsExist) skipped the
    // fixpoint forever and the missed group never formed. Worst shape:
    // the stale edge BRIDGES two components that each already carry a
    // label (both endpoints labeled, labels differ) — endpoint-presence
    // checks pass; only the same-label-per-edge invariant catches it.
    //
    // Fixture (same searched-collider machinery as the eviction test):
    //   A (1) / A2 (3)  — identical docs: the stream verifies them.
    //   B (50)          — below-gate collider with ALL of A's bands;
    //                     with maxDocsPerBand=1 it evicts A everywhere.
    //   C (2) / C2 (4)  — C is a TRUE near-dup of A sharing a band with
    //                     it (searched); C2 is identical to C; the
    //                     stream verifies (C, C2) but can never pair
    //                     (A, C) — B holds every bucket where they'd meet.
    // Stream labels: {1,3} and {2,4} — two components, all four docs
    // labeled. The sweep's bridge edges (A↔C cross pairs) then land in
    // the log with no label write: the crashed-sweep state.
    val aToks = (0 until 30).map(i => s"a$i").toVector
    def bText(s: Int) = aToks.updated(14, s"b${s}p").updated(15, s"b${s}q").mkString(" ")
    def cText(s: Int) = aToks.updated(29, s"c$s").mkString(" ")
    val cands = Seq((1L, aToks.mkString(" "))) ++
      (0 until 300).map(s => (1000L + s, bText(s))) ++
      (0 until 10).map(s => (2000L + s, cText(s)))
    val bandsByDoc = cands.toDF("doc_id", "text")
      .withColumn("toks", split(col("text"), " "))
      .withColumn("shingles", expr(EventStream.shinglesSql))
      .withColumn("sig", expr("minhash_sig(shingles)"))
      .select(col("doc_id"), expr(EventStream.bandsSql).as("bands"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toVector).toMap
    val aBands = bandsByDoc(1L)
    val bSeed = (0 until 300).find(s => bandsByDoc(1000L + s) == aBands)
    assert(bSeed.isDefined, "no all-band collider below the jaccard gate in 300 candidates")
    val cSeed = (0 until 10).find(s => bandsByDoc(2000L + s).exists(aBands.contains))
    assert(cSeed.isDefined, "no near-dup variant sharing a band with A in 10 candidates")

    def docsOf(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("src0"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val watched = java.nio.file.Files.createTempDirectory("docs_stale_src")
    val workDir = java.nio.file.Files.createTempDirectory("stale_work").toString
    stageFile(watched, "b1", docsOf(Seq(1L -> aToks.mkString(" "))), 0)
    stageFile(watched, "b2", docsOf(Seq(3L -> aToks.mkString(" "))), 10)
    stageFile(watched, "b3", docsOf(Seq(50L -> bText(bSeed.get))), 20)
    stageFile(watched, "b4", docsOf(Seq(2L -> cText(cSeed.get))), 30)
    stageFile(watched, "b5", docsOf(Seq(4L -> cText(cSeed.get))), 40)
    val pre = EventStream.runDedupGroupsStream(spark, watched.toString, workDir,
      maxFilesPerTrigger = Some(1), maxDocsPerBand = 1).collect()
    assert(pre.map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("group_id"))).toSet
      == Set((1L, 1L), (3L, 1L), (2L, 2L), (4L, 2L)),
      s"stream must hold exactly the {1,3} and {2,4} groups: ${pre.toSeq}")

    // Replay the crashed sweep's first half by hand: append its fresh
    // edges to the log exactly as reconcileGroupsSweep does, then "die"
    // without touching the labels.
    val sweepEdges = EventStream.batchNearDupEdges(spark, watched.toString)
    val freshEdges = sweepEdges.join(
      spark.read.parquet(s"$workDir/edges"), Seq("src", "dst"), "left_anti")
      .persist() // the append's plan reads the log it appends to — pin first
    assert(freshEdges.count() >= 1, "fixture must produce un-logged bridge edges")
    freshEdges.write.mode(org.apache.spark.sql.SaveMode.Append)
      .parquet(s"$workDir/edges")
    freshEdges.unpersist(blocking = false)
    spark.catalog.refreshByPath(s"$workDir/edges")

    // The replayed sweep finds nothing fresh but must still detect the
    // log↔label divergence and run the fixpoint: all four docs merge.
    val post = EventStream.reconcileGroupsSweep(spark, watched.toString, workDir)
      .collect()
    assert(post.map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("group_id"),
        r.getAs[Long]("group_size"))).toSet
      == Set((1L, 1L, 4L), (2L, 1L, 4L), (3L, 1L, 4L), (4L, 1L, 4L)),
      s"stale labels must repair to one merged group: ${post.toSeq}")
    // And the repair converges: a second sweep is a clean fast-path no-op.
    val logN = spark.read.parquet(s"$workDir/edges").count()
    val post2 = EventStream.reconcileGroupsSweep(spark, watched.toString, workDir)
      .collect()
    assert(post2.map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("group_id"))).toSet
      == post.map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("group_id"))).toSet)
    assert(spark.read.parquet(s"$workDir/edges").count() == logN,
      "converged sweep must not grow the log")
  }

  /** Rows (event_id, ts-string) → events-schema DataFrame. */
  private def mkEvents(rows: Seq[(Long, String)]): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    rows.map { case (id, t) =>
      (id, java.sql.Timestamp.valueOf(t), id % 5, "click", 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  /** Stage `df` as a single parquet file in `watched` with a controlled
    * modification time, so maxFilesPerTrigger=1 yields one micro-batch per
    * staged file in `modOffsetSec` order.
    */
  private def stageFile(watched: java.nio.file.Path, name: String,
                        df: org.apache.spark.sql.DataFrame, modOffsetSec: Long): Unit = {
    import java.nio.file.{Files, StandardCopyOption}
    import java.nio.file.attribute.FileTime
    val tmp = Files.createTempDirectory(s"late_stage_$name").toString
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
    val dst = watched.resolve(s"$name.parquet")
    Files.move(part.toPath, dst, StandardCopyOption.REPLACE_EXISTING)
    Files.setLastModifiedTime(dst,
      FileTime.fromMillis(System.currentTimeMillis() - 60000 + modOffsetSec * 1000))
  }

  test("append-mode watermark drops a too-late event") {
    import org.apache.spark.sql.streaming.OutputMode
    import java.nio.file.Files

    // One micro-batch per file (maxFilesPerTrigger=1, mod-time ordered).
    // Spark keeps TWO watermarks per batch (SPARK-42376): the late-event
    // filter uses the PREVIOUS batch's watermark, eviction uses the current
    // one. Batch 0 carries the 10:00 window and a 12:00 event, so the
    // eviction watermark in batch 1 is 11:50 — but batch 1's late-event
    // watermark is still epoch 0. Hence the filler batch 1 (12:01): it lets
    // the [10:00, 10:10) window finalize at 3 events, and by batch 2 the
    // late-event watermark has advanced to 11:50, so batch 2's 10:05 event
    // (105 minutes late) is dropped by the watermark filter.
    val watched = Files.createTempDirectory("late_src")
    def stage(name: String, df: org.apache.spark.sql.DataFrame, modOffsetSec: Long): Unit =
      stageFile(watched, name, df, modOffsetSec)
    stage("a", mkEvents(Seq(
      (1L, "2024-01-01 10:00:30"), (2L, "2024-01-01 10:02:00"),
      (3L, "2024-01-01 10:04:00"), (4L, "2024-01-01 12:00:00"))), 0)
    stage("b", mkEvents(Seq((7L, "2024-01-01 12:01:00"))), 10) // filler
    stage("c", mkEvents(Seq((5L, "2024-01-01 10:05:00"))), 20) // late
    stage("d", mkEvents(Seq((6L, "2024-01-01 12:30:00"))), 30)

    val q = spark.readStream.schema(EventStream.eventSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(watched.toString)
      .withWatermark("ts", "10 minutes")
      // Must group by the window STRUCT: extracting ("start") before the agg
      // severs the watermark link and append mode rejects the plan.
      .groupBy(window(col("ts"), "10 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"), col("n_events"))
      .writeStream.format("memory").queryName("late_test")
      .outputMode(OutputMode.Append()).start()
    q.processAllAvailable(); q.stop()

    val out = spark.table("late_test")
      .filter(col("window_start") === lit(java.sql.Timestamp.valueOf("2024-01-01 10:00:00")))
      .collect()
    // Exactly one finalized emission of the 10:00 window, and the late
    // event 5 is NOT in it (3 on-time events, not 4).
    assert(out.length == 1, s"expected one 10:00 window row, got ${out.toSeq}")
    assert(out.head.getAs[Long]("n_events") == 3L,
      s"late event leaked into the finalized window: ${out.toSeq}")
    // And the operator itself reports exactly one watermark-dropped row.
    val dropped = q.recentProgress.flatMap(_.stateOperators)
      .map(_.numRowsDroppedByWatermark).sum
    assert(dropped == 1L, s"expected 1 row dropped by watermark, got $dropped")
  }

  test("sessionization across micro-batches: gap event closes the old session, opens a new one") {
    import java.nio.file.Files
    // Batch 0: user 42's session starts (10:00, 10:05). Batch 1 arrives
    // out of order within the batch: 10:06 (still in-session — must extend,
    // not reopen) and 11:00 (54 min after 10:06 → closes the first session
    // at n=3 and opens a NEW session rather than extending the closed one).
    // State carries the open session across the batch boundary.
    val watched = Files.createTempDirectory("sess_src")
    // event_id chosen ≡ 2 (mod 5) so all rows land on user_id 2.
    stageFile(watched, "a", mkEvents(Seq(
      (2L, "2024-01-01 10:00:00"), (7L, "2024-01-01 10:05:00"))), 0)
    stageFile(watched, "b", mkEvents(Seq(
      (17L, "2024-01-01 11:00:00"), (12L, "2024-01-01 10:06:00"))), 10)

    val closed = EventStream.runSessionize(
      spark, watched.toString, "sess_gap_test", maxFilesPerTrigger = Some(1))
      .filter(col("user_id") === 2L).collect()
    assert(closed.length == 1, s"expected exactly one closed session, got ${closed.toSeq}")
    val row = closed.head
    assert(row.getAs[java.sql.Timestamp]("session_start") ==
      java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), s"wrong session start: $row")
    assert(row.getAs[Long]("n_events") == 3L,
      s"out-of-order in-session event must extend, not reopen: $row")
  }

  test("streaming dedup drops a cross-batch duplicate within the watermark") {
    import java.nio.file.Files
    val watched = Files.createTempDirectory("dedup_src")
    stageFile(watched, "a", mkEvents(Seq(
      (1L, "2024-01-01 10:00:00"), (2L, "2024-01-01 10:02:00"),
      (3L, "2024-01-01 10:04:00"))), 0)
    // Batch 1 re-sends event_id 2 (within the 1 h watermark → must drop)
    // alongside a genuinely new event.
    stageFile(watched, "b", mkEvents(Seq(
      (2L, "2024-01-01 10:06:00"), (4L, "2024-01-01 10:30:00"))), 10)

    val out = EventStream.runDedupStream(
      spark, watched.toString, "dedup_stream_test", maxFilesPerTrigger = Some(1))
    assert(out.count() == 4, s"expected 4 unique events, got ${out.collect().toSeq}")
    assert(out.filter(col("event_id") === 2L).count() == 1,
      "the re-sent event_id must appear exactly once")
  }

  test("streaming packer emits exactly the batch operator's full sequences, cross-batch") {
    import java.nio.file.Files
    import spark.implicits._
    def mkDocs(rows: Seq[(Long, Int, String)]) =
      rows.map { case (id, n, src) =>
        (id, Seq.fill(n)("w").mkString(" "), "en", src, 0L)
      }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val watched = Files.createTempDirectory("pack_src")
    // Batch 1 leaves s0 mid-sequence (400 of 512 tokens) and s1 barely
    // started (10 tokens); batch 2 must close both from carried state.
    val batch1 = Seq((1L, 300, "s0"), (2L, 100, "s0"), (4L, 10, "s1"))
    val batch2 = Seq((3L, 200, "s0"), (5L, 300, "s1"))
    stageFile(watched, "a", mkDocs(batch1), 0)
    stageFile(watched, "b", mkDocs(batch2), 10)
    val streamed = EventStream.runPackStream(
      spark, watched.toString, "pack_stream_test", maxFilesPerTrigger = Some(1))
      .select("source", "seq_id", "n_docs", "seq_tokens", "n_straddle", "first_doc")
      .collect().map(_.toSeq).toSet
    val batch = graft.queries.TextOps
      .packSequencesOver(mkDocs(batch1 ++ batch2), 256)
      .filter(col("seq_tokens") === 256) // the open tail stays in stream state
      .select("source", "seq_id", "n_docs", "seq_tokens", "n_straddle", "first_doc")
      .collect().map(_.toSeq).toSet
    assert(streamed.nonEmpty && streamed == batch,
      s"streamed $streamed != batch $batch")
    // The s0 sequence closed by batch 2 spans both micro-batches.
    assert(streamed.exists(r => r == Seq("s0", 1L, 3L, 256L, 2L, 1L)))
  }

  test("streaming boilerplate cut equals the batch rewrite under the frozen hot set") {
    import java.nio.file.Files
    import spark.implicits._
    val banner = "subscribe to our newsletter for weekly updates now"
    def mkDocs(rows: Seq[(Long, String)]) =
      rows.map { case (id, t) => (id, t, "en", "s0", t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
    // The banner appears in 3 docs spread across BOTH micro-batches —
    // only a hot set trained on the full corpus can see df = 3, which is
    // exactly why the stream takes the frozen set as input.
    val b1 = Seq(
      (1L, s"$banner a1 a2 a3 a4 a5 a6 a7 a8"),
      (2L, s"$banner b1 b2 b3 b4 b5 b6 b7 b8"))
    val b2 = Seq(
      (3L, s"$banner c1 c2 c3 c4 c5 c6 c7 c8"),
      (4L, "plain unique text with no banner at all here"))
    val allDocs = mkDocs(b1 ++ b2)
    val hot = graft.queries.TextOps.boilerHotSegments(allDocs, 3)
      .collect().map(_.getString(0)).toSeq
    assert(hot == Seq(banner), s"hot set must be exactly the banner: $hot")
    val watched = Files.createTempDirectory("boiler_src")
    stageFile(watched, "a", mkDocs(b1), 0)
    stageFile(watched, "b", mkDocs(b2), 10)
    val streamed = EventStream.runBoilerStream(
      spark, watched.toString, "boiler_stream_test", hot, maxFilesPerTrigger = Some(1))
      .select("doc_id", "n_seg", "n_boiler", "clean_text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    val batch = graft.queries.TextOps.boilerplateCleanOver(allDocs, 3)
      .select("doc_id", "n_seg", "n_boiler", "clean_text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    assert(streamed.size == 4 && streamed == batch, s"stream $streamed != batch $batch")
    // The cut is real: doc 1's banner is gone, doc 4 untouched.
    val byId = streamed.map(t => t._1 -> t._4).toMap
    assert(byId(1L) == "a1 a2 a3 a4 a5 a6 a7 a8")
    assert(byId(4L) == "plain unique text with no banner at all here")
  }

  test("streaming BM25 scoring equals the batch transform under frozen index stats") {
    import java.nio.file.Files
    import spark.implicits._
    def mkDocs(rows: Seq[(Long, String)]) =
      rows.map { case (id, t) => (id, t, "en", "s0", t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
    // The standing corpus the index (and so df/n_docs/avgdl) is frozen on.
    val corpusRows = Seq(
      1L -> "vector hash merge window vector",
      2L -> "hash table scan with a hash inside",
      3L -> "merge sort merge join merge again and the window",
      4L -> "no query term at all")
    val corpusDir = Files.createTempDirectory("bm25s_corpus").toString
    mkDocs(corpusRows).write.mode("overwrite").parquet(s"$corpusDir/documents.parquet")
    val idx = Files.createTempDirectory("bm25s_idx").toString
    graft.ext.PostingsIndex.ensure(spark, corpusDir, idx)
    val terms = Seq("vector", "hash", "merge", "window")
    // Arriving docs across two micro-batches, incl. a zero-hit doc.
    val b1 = Seq(10L -> "vector vector hash arrives now",
                 11L -> "nothing relevant in this one")
    val b2 = Seq(12L -> "window merge window")
    val watched = Files.createTempDirectory("bm25s_src")
    stageFile(watched, "a", mkDocs(b1), 0)
    stageFile(watched, "b", mkDocs(b2), 10)
    val streamed = EventStream.runBm25Stream(
      spark, watched.toString, idx, terms, "bm25_stream_test",
      maxFilesPerTrigger = Some(1))
      .collect().map(_.toSeq).toSet
    // Batch twin: the same transform with the same frozen stats.
    val (n, sumDl) = graft.ext.PostingsIndex.corpusStats(spark, idx)
    val dfs = graft.ext.PostingsIndex.termstats(spark, idx)
      .filter(col("term").isin(terms: _*))
      .groupBy(col("term")).agg(count(lit(1)).cast("double").as("df"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val batch = EventStream.bm25ScoreTransform(
      terms.map(t => t -> dfs.getOrElse(t, 0.0)), n, sumDl.toDouble / n)(
      mkDocs(b1 ++ b2))
      .collect().map(_.toSeq).toSet
    assert(streamed.size == 3 && streamed == batch,
      s"stream $streamed != batch $batch")
    // The zero-hit doc is ROUTED (kept with a negative verdict), not dropped.
    assert(streamed.exists(r => r(0) == 11L && r(2) == 0L && r(3) == 0.0))
    // A hit doc scores positive with the right term count.
    assert(streamed.exists(r => r(0) == 10L && r(2) == 2L &&
      r(3).asInstanceOf[Double] > 0.0))
  }

  test("streaming CMS counter table equals the batch kernel over the same files") {
    import java.nio.file.Files
    import spark.implicits._
    def mkDocs(rows: Seq[(Long, String)]) =
      rows.map { case (id, t) => (id, t, "en", "s0", t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
    // Token multiset split across two micro-batches — counter addition is
    // associative, so the final complete-mode table must be cell-equal to
    // the batch counters over the union (and bounded at d·w rows).
    val b1 = Seq((1L, "a a b hot hot hot"), (2L, "c hot a"))
    val b2 = Seq((3L, "hot hot b b c d e"), (4L, "a hot"))
    val watched = Files.createTempDirectory("cms_src")
    stageFile(watched, "a", mkDocs(b1), 0)
    stageFile(watched, "b", mkDocs(b2), 10)
    val streamed = EventStream.runCmsStream(
      spark, watched.toString, "cms_stream_test", maxFilesPerTrigger = Some(1))
      .collect().map(r => (r.getAs[Int]("j"), r.getAs[Long]("bucket")) ->
        r.getAs[Long]("cnt")).toMap
    assert(streamed.size <= 4 * 128, "counter state exceeded d x w")
    val all = mkDocs(b1 ++ b2)
      .select(explode(split(col("text"), " ")).as("tok")).withColumn("w", lit(1L))
    val batch = graft.queries.Sketch.cmsCountersOver(all)
      .collect().map(r => (r.getAs[Int]("j"), r.getAs[Long]("bucket")) ->
        r.getAs[Long]("cnt")).toMap
    assert(streamed == batch, s"stream counters != batch: " +
      s"onlyStream=${streamed.toSet -- batch.toSet} onlyBatch=${batch.toSet -- streamed.toSet}")
    // The hot token (7 occurrences) really dominates its counters.
    assert(batch.values.max >= 7L)
  }

  test("streaming HLL registers equal the batch kernel (max-merge across micro-batches)") {
    import java.nio.file.Files
    import spark.implicits._
    def mkDocs(rows: Seq[(Long, String)]) =
      rows.map { case (id, t) => (id, t, "en", s"s${id % 2}", t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
    val b1 = Seq((1L, "alpha beta gamma alpha"), (2L, "delta beta"))
    val b2 = Seq((3L, "epsilon zeta alpha"), (4L, "beta eta theta"))
    val watched = Files.createTempDirectory("hll_src")
    stageFile(watched, "a", mkDocs(b1), 0)
    stageFile(watched, "b", mkDocs(b2), 10)
    val streamed = EventStream.runHllStream(
      spark, watched.toString, "hll_stream_test", maxFilesPerTrigger = Some(1))
      .collect().map(r => (r.getAs[String]("source"), r.getAs[Long]("j")) ->
        r.getAs[Int]("mj")).toMap
    assert(streamed.size <= 64 * 2, "register state exceeded m x sources")
    val batch = graft.queries.Sketch.hllRegisters(
      graft.queries.Sketch.hashTokens(mkDocs(b1 ++ b2)
        .select(col("source"), explode(split(col("text"), " ")).as("tok"))))
      .collect().map(r => (r.getAs[String]("source"), r.getAs[Long]("j")) ->
        r.getAs[Int]("mj")).toMap
    assert(streamed == batch, s"stream registers != batch: " +
      s"onlyStream=${streamed.toSet -- batch.toSet} onlyBatch=${batch.toSet -- streamed.toSet}")
  }

  test("streaming length-histogram counters equal the batch kernel under frozen bounds") {
    import java.nio.file.Files
    import spark.implicits._
    def mkDocs(rows: Seq[(Long, String, Long)]) =
      rows.map { case (id, src, n) => (id, "x", "en", src, n) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
    // Frozen [lo, hi] = the standing corpus's bounds; lengths split
    // across two micro-batches — counter addition is associative, so
    // the complete-mode table must be cell-equal to the batch kernel
    // over the union, and bounded at bins·sources rows.
    val b1 = Seq((1L, "sA", 10L), (2L, "sA", 500L), (3L, "sB", 10L))
    val b2 = Seq((4L, "sA", 999L), (5L, "sB", 480L), (6L, "sB", 11L))
    val (lo, hi) = (10L, 999L)
    val watched = Files.createTempDirectory("hist_src")
    stageFile(watched, "a", mkDocs(b1), 0)
    stageFile(watched, "b", mkDocs(b2), 10)
    val streamed = EventStream.runHistStream(
      spark, watched.toString, "hist_stream_test", lo, hi,
      maxFilesPerTrigger = Some(1))
      .collect().map(r => (r.getAs[String]("source"), r.getAs[Long]("bucket")) ->
        r.getAs[Long]("cnt")).toMap
    assert(streamed.size <= 128 * 2, "counter state exceeded bins x sources")
    val batch = graft.queries.Sketch.qsHistOver(
      mkDocs(b1 ++ b2).withColumn("lo", lit(lo)).withColumn("hi", lit(hi)))
      .collect().map(r => (r.getAs[String]("source"), r.getAs[Long]("bucket")) ->
        r.getAs[Long]("cnt")).toMap
    assert(streamed == batch, s"stream histogram != batch: " +
      s"onlyStream=${streamed.toSet -- batch.toSet} onlyBatch=${batch.toSet -- streamed.toSet}")
  }

  test("streaming model scoring equals the batch scorer across micro-batches") {
    import java.nio.file.Files
    import spark.implicits._
    def mkDocs(rows: Seq[(Long, String)]) =
      rows.map { case (id, t) => (id, t, "en", "s0", t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
    val b1 = Seq((1L, "alpha beta gamma"), (2L, "delta epsilon"))
    val b2 = Seq((3L, "zeta eta theta iota"), (4L, "kappa"))
    val watched = Files.createTempDirectory("score_src")
    stageFile(watched, "a", mkDocs(b1), 0)
    stageFile(watched, "b", mkDocs(b2), 10)
    val streamed = EventStream.runScoreStream(
      spark, watched.toString, "score_stream_test", maxFilesPerTrigger = Some(1))
      .select("doc_id", "model_score", "keep")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2))).toSet
    // Batch twin: the oracle-verified q_quality_model over the SAME docs.
    val batchDir = Files.createTempDirectory("score_batch").toString
    mkDocs(b1 ++ b2).write.mode("overwrite").parquet(s"$batchDir/documents.parquet")
    val batch = graft.queries.TextOps.queries("q_quality_model")(spark, batchDir)
      .select("doc_id", "model_score", "keep")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2))).toSet
    assert(streamed.size == 4 && streamed == batch,
      s"stream $streamed != batch $batch")
  }

  test("streaming admission quota: counters persist across micro-batches, rejects audited") {
    import java.nio.file.Files
    import spark.implicits._
    def mkDocs(rows: Seq[(Long, String)]) =
      rows.map { case (id, src) => (id, "w", "en", src, 1L) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
    val watched = Files.createTempDirectory("admit_src")
    // Quota 3 per source. Batch 1 part-fills s0 (2 docs); batch 2 brings
    // 3 more s0 docs — only the id-smallest lands on the carried counter
    // — while s1 stays under quota throughout.
    stageFile(watched, "a", mkDocs(Seq((1L, "s0"), (2L, "s0"), (10L, "s1"))), 0)
    stageFile(watched, "b", mkDocs(Seq((5L, "s0"), (3L, "s0"), (4L, "s0"), (11L, "s1"))), 10)
    val out = EventStream.runAdmitStream(
      spark, watched.toString, "admit_stream_test", quota = 3L,
      maxFilesPerTrigger = Some(1)).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Boolean]("admitted"), r.getAs[Long]("source_seq"))).toMap
    assert(out.size == 7, s"every doc must appear, admitted or not: $out")
    assert(out(1L) == (true, 1L) && out(2L) == (true, 2L) && out(3L) == (true, 3L),
      s"s0 admits its first three by id: $out")
    assert(out(4L) == (false, -1L) && out(5L) == (false, -1L),
      s"s0 overflow must be rejected with the audit marker: $out")
    assert(out(10L) == (true, 1L) && out(11L) == (true, 2L),
      s"s1 never reaches quota: $out")
  }

  test("stream-stream interval join equals the batch join") {
    val streamed = EventStream.runClickPurchaseJoin(spark, sourceDir, "attrib_test")
    val ev = Tables.events(spark, sfDir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts"), col("event_id").as("click_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user_id"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"), col("value").as("purchase_value"))
    val batch = clicks.join(purchases,
      col("user_id") === col("p_user_id") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr("INTERVAL 30 MINUTES"))
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        col("click_ts"), col("purchase_ts"), col("purchase_value"))
    assert(streamed.count() > 0, "the interval join should find attributed purchases")
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).count() == 0)
  }

  test("left-outer interval join emits null for a provably unmatched click") {
    import java.nio.file.Files
    val watched = Files.createTempDirectory("outer_src")
    // Batch 0 (user 2): click 10:00 matched by purchase 10:10; click
    // 11:00 unmatched. The global watermark is the MIN across both
    // watermarked streams — so batch 1 advances BOTH sides past 19:00
    // (click 20:00 user 2, purchase 20:05 user 3 — different users, no
    // new match). Only then is "no purchase ≤ 11:30" provable for the
    // 11:00 click. Eviction (the null emission) runs in a later batch
    // than the watermark advance (SPARK-42376 lag) — the two view
    // batches trigger it. The 20:00 click's window stays open → no row.
    def ev(id: Long, t: String, typ: String) = {
      import spark.implicits._
      Seq((id, java.sql.Timestamp.valueOf(t), id % 5, typ, 1.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    }
    stageFile(watched, "a",
      ev(2L, "2024-01-01 10:00:00", "click")
        .unionAll(ev(7L, "2024-01-01 10:10:00", "purchase"))
        .unionAll(ev(12L, "2024-01-01 11:00:00", "click")), 0)
    stageFile(watched, "b",
      ev(17L, "2024-01-01 20:00:00", "click")
        .unionAll(ev(23L, "2024-01-01 20:05:00", "purchase")), 10)
    stageFile(watched, "c", ev(22L, "2024-01-01 20:30:00", "view"), 20)
    stageFile(watched, "d", ev(27L, "2024-01-01 21:00:00", "view"), 30)

    val out = EventStream.runClickPurchaseJoinOuter(
      spark, watched.toString, "outer_join_test", maxFilesPerTrigger = Some(1))
    val matched = out.filter(col("click_id") === 2L).collect()
    assert(matched.length == 1 && matched.head.getAs[Long]("purchase_id") == 7L,
      s"click 2 should match purchase 7: ${out.collect().toSeq}")
    val unmatched = out.filter(col("click_id") === 12L).collect()
    assert(unmatched.length == 1 && unmatched.head.isNullAt(unmatched.head.fieldIndex("purchase_id")),
      s"click 12 should emit null-extended: ${out.collect().toSeq}")
  }

  test("foreachBatch parquet sink lands exactly the deduped rows") {
    import java.nio.file.Files
    val out = Files.createTempDirectory("dedup_out").toString
    EventStream.runDedupToParquet(spark, sourceDir, out)
    val expected = Tables.events(spark, sfDir).select("event_id").distinct().count()
    assert(spark.read.parquet(out).count() == expected)
  }

  test("checkpoint recovery: restart resumes without reprocessing or re-admitting dups") {
    import java.nio.file.Files
    val watched = Files.createTempDirectory("ckpt_src")
    val out = Files.createTempDirectory("ckpt_out").toString
    val ckpt = Files.createTempDirectory("ckpt_meta").toString
    // Phase 1: three events land in parquet through the deduped stream.
    stageFile(watched, "a", mkEvents(Seq(
      (1L, "2024-01-01 10:00:00"), (2L, "2024-01-01 10:02:00"),
      (3L, "2024-01-01 10:04:00"))), 0)
    EventStream.runDedupToParquet(spark, watched.toString, out,
      checkpointDir = Some(ckpt))
    assert(spark.read.parquet(out).count() == 3)
    // Phase 2: the query RESTARTS from the same checkpoint; the new batch
    // re-sends event 2 (must stay dropped — dedup state lives in the
    // checkpoint) and adds event 4. Batch 0 must not be reprocessed.
    stageFile(watched, "b", mkEvents(Seq(
      (2L, "2024-01-01 10:05:00"), (4L, "2024-01-01 10:30:00"))), 10)
    EventStream.runDedupToParquet(spark, watched.toString, out,
      checkpointDir = Some(ckpt))
    val rows = spark.read.parquet(out)
    assert(rows.count() == 4, s"expected 3 old + 1 new rows, got ${rows.collect().toSeq}")
    assert(rows.filter(col("event_id") === 2L).count() == 1,
      "checkpointed dedup state must survive the restart")
  }

  test("streaming IVF assignment equals the batch frozen-centroid table, cross-batch") {
    import spark.implicits._
    // The frozen quantizer + the batch truth (ivfIncrParts: centroids
    // trained on the base corpus; asg holds every vector's frozen-
    // centroid assignment with is_new marking the ingest batch).
    val (cent, asg) = graft.queries.Similarity.ivfIncrParts(spark, sfDir)
    val batchNew = asg.filter(col("is_new"))
      .select("vec_id", "cluster", "dist").as[(Long, Long, Double)]
      .collect().sortBy(_._1)
    assert(batchNew.nonEmpty)
    // The new batch arrives as a 2-file stream → ≥2 micro-batches.
    val src = java.nio.file.Files.createTempDirectory("ivf_assign_src").toString
    Tables.embeddings(spark, sfDir).filter(col("vec_id") % 5 === 0)
      .repartition(2).write.mode("overwrite").parquet(src)
    val streamed = EventStream.runIvfAssignStream(spark, src, "ivf_assign_test",
        cent, maxFilesPerTrigger = Some(1))
      .select("vec_id", "cluster", "dist").as[(Long, Long, Double)]
      .collect().sortBy(_._1)
    assert(streamed.toSeq == batchNew.toSeq,
      "streaming frozen-centroid assignment diverged from the batch table")
    graft.queries.Det.releasePins(spark)
  }

  test("streaming IVF drift monitor converges to the batch incremental report") {
    import spark.implicits._
    val (cent, _) = graft.queries.Similarity.ivfIncrParts(spark, sfDir)
    val batch = graft.queries.Similarity.queries("q_knn_ivf_incr")(spark, sfDir)
      .filter(col("n_new") > 0)
      .select("cluster", "n_new", "mean_dist_new").as[(Long, Long, Double)]
      .collect().sortBy(_._1)
    val src = java.nio.file.Files.createTempDirectory("ivf_drift_src").toString
    Tables.embeddings(spark, sfDir).filter(col("vec_id") % 5 === 0)
      .repartition(2).write.mode("overwrite").parquet(src)
    val drift = EventStream.runIvfDriftStream(spark, src, "ivf_drift_test",
      cent, maxFilesPerTrigger = Some(1))
    // Update mode re-emits a cluster's running totals every touched
    // batch; n_new is monotone, so max(n_new) per cluster is the
    // converged row.
    val last = drift.groupBy(col("cluster"))
      .agg(max(struct(col("n_new"), col("mean_dist_new"))).as("s"))
      .select(col("cluster"), col("s.n_new"), col("s.mean_dist_new"))
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(last.toSeq == batch.toSeq,
      s"converged stream drift != batch report:\nstream ${last.toSeq}\nbatch  ${batch.toSeq}")
    graft.queries.Det.releasePins(spark)
  }

  test("streaming drift TRIGGER converges to the batch decision (q_knn_drift_decide)") {
    import spark.implicits._
    val (cent, _) = graft.queries.Similarity.ivfIncrParts(spark, sfDir)
    val decide = graft.queries.Similarity.queries("q_knn_drift_decide")(spark, sfDir)
    val baseStats = decide
      .select("cluster", "mean_dist_base").as[(Long, Double)].collect().toMap
    val batch = decide.filter(col("n_new") > 0)
      .select("cluster", "n_new", "mean_dist_new", "mean_dist_base",
        "drift_ratio", "would_rebuild")
      .as[(Long, Long, Double, Double, Double, Boolean)].collect().sortBy(_._1)
    assert(batch.nonEmpty)
    val src = java.nio.file.Files.createTempDirectory("ivf_trig_src").toString
    Tables.embeddings(spark, sfDir).filter(col("vec_id") % 5 === 0)
      .repartition(2).write.mode("overwrite").parquet(src)
    val trig = EventStream.runIvfDriftTriggerStream(spark, src, "ivf_trig_test",
      cent, baseStats, maxFilesPerTrigger = Some(1))
    // n_new is monotone per cluster → max(struct) is the converged row.
    val last = trig.groupBy(col("cluster"))
      .agg(max(struct(col("n_new"), col("mean_dist_new"), col("mean_dist_base"),
        col("drift_ratio"), col("would_rebuild"))).as("s"))
      .select(col("cluster"), col("s.n_new"), col("s.mean_dist_new"),
        col("s.mean_dist_base"), col("s.drift_ratio"), col("s.would_rebuild"))
      .as[(Long, Long, Double, Double, Double, Boolean)].collect().sortBy(_._1)
    assert(last.toSeq == batch.toSeq,
      s"converged stream decision != batch decision:\nstream ${last.toSeq}\nbatch  ${batch.toSeq}")
    graft.queries.Det.releasePins(spark)
  }

  test("stateful sessionization closes sessions on the 30-minute gap") {
    val sessions = EventStream.runSessionize(spark, sourceDir, "sess_test")
    // Closed sessions emitted by the stream + one open session per user
    // retained in state = total batch sessions.
    val batchSessions = graft.queries.Events.eventsSession(spark, sfDir).count()
    val users = Tables.events(spark, sfDir).select("user_id").distinct().count()
    assert(sessions.count() + users == batchSessions)
    assert(sessions.filter(col("n_events") <= 0).count() == 0)
  }
}
