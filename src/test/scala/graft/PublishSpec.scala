package graft

import org.apache.spark.sql.functions._
import graft.ext.{AnnIndex, BpeArtifact, PostingsIndex, Publish, RpIndex}

/** The full publish chain: dirty JSONL dump → cleaned serving corpus +
  * every index artifact current, in one call; a re-publish of the
  * unchanged dump leaves every artifact provably untouched.
  */
class PublishSpec extends SparkSpec {
  import spark.implicits._

  private def freshText(tag: String): String =
    (0 until 40).map(i => s"${tag}w$i").mkString(" ")

  private def jline(id: Long, text: String): String =
    s"""{"doc_id": $id, "text": "$text", "lang": "en", "source": "s${id % 2}", "n_chars": ${text.length}}"""

  test("publish lands serving corpus + all artifacts; re-publish no-ops the index phase") {
    // 8 clean docs + one exact-dup (drops) + one broken line (quarantine).
    val lines = (0L until 8L).map(i => jline(i, freshText(s"p$i"))) ++
      Seq(jline(20L, freshText("p0")), """{"broken""")
    val src = java.nio.file.Files.createTempDirectory("publish_src")
    java.nio.file.Files.write(src.resolve("dump.jsonl"),
      lines.mkString("\n").getBytes("UTF-8"))
    // Embeddings for every ingested doc (64-dim blobs keyed by doc_id);
    // the publish must restrict them to the SURVIVORS.
    val emb = (0L until 8L).union(Seq(20L)).toSeq.map { id =>
      (id, Array.tabulate(64)(i => ((id * 7 + i) % 13 - 6).toFloat))
    }.toDF("doc_id", "embedding")

    val out = java.nio.file.Files.createTempDirectory("publish_out").toString
    val r = Publish.run(spark, src.resolve("dump.jsonl").toString, out,
      embeddings = Some(emb))
    assert(r.run.ingested == 9 && r.run.quarantined == 1, s"got $r")
    assert(r.servingDocs == 8, s"one exact dup drops: $r")
    assert(r.servingVecs == 8, s"embeddings restricted to survivors: $r")
    assert(r.index.annBuilt && r.index.postingsBuilt && r.index.rpBuilt
      && r.index.bpeTrained, s"cold publish must build every artifact: $r")
    assert(r.index.annAction == "noop" && r.index.bpeAction == "noop")
    val servingDir = s"$out/serving"
    assert(AnnIndex.isBuilt(AnnIndex.defaultIndexDir(servingDir)))
    assert(PostingsIndex.isBuilt(PostingsIndex.defaultDir(servingDir)))
    assert(RpIndex.isBuilt(RpIndex.defaultDir(servingDir)))
    assert(BpeArtifact.isBuilt(BpeArtifact.defaultDir(servingDir)))
    // The published serving corpus IS a queryable corpus dir.
    assert(graft.queries.TextOps.queries("q_phrase_search")(spark, servingDir)
      .collect() != null)

    // Re-publish the identical dump: pipeline re-runs, index phase no-ops.
    val r2 = Publish.run(spark, src.resolve("dump.jsonl").toString, out,
      embeddings = Some(emb))
    assert(!r2.index.annBuilt && !r2.index.postingsBuilt && !r2.index.rpBuilt
      && !r2.index.bpeTrained, s"re-publish must not rebuild: $r2")
    assert(r2.index.annAction == "noop" && r2.index.bpeAction == "noop")
    graft.queries.Det.releasePins(spark)
  }

  test("a publish killed mid-stage leaves the prior serving version readable AND indexed") {
    // r12 VERDICT #1: the serving corpus was the last in-place-mutated
    // serving artifact. Now it version-chains: kill the publish between
    // staging and the CURRENT flip and the prior snapshot keeps serving
    // with every index still current; the flip itself is atomic.
    val lines = (0L until 6L).map(i => jline(200 + i, freshText(s"k$i")))
    val src = java.nio.file.Files.createTempDirectory("publish_src3")
    java.nio.file.Files.write(src.resolve("dump.jsonl"),
      lines.mkString("\n").getBytes("UTF-8"))
    val out = java.nio.file.Files.createTempDirectory("publish_out3").toString
    val servingDir = s"$out/serving"
    Publish.run(spark, src.resolve("dump.jsonl").toString, out)
    val v1 = graft.ext.Versioned.currentVersion(servingDir)
    val docsBefore = Tables.documents(spark, servingDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet

    // The kill window: stage the next snapshot completely, die before
    // the flip (stageServing is exactly the pre-promote half of run).
    val (v2, _) = Publish.stageServing(spark, out, embeddings = None)
    assert(v2 > v1)
    assert(graft.ext.Versioned.currentVersion(servingDir) == v1,
      "an unpromoted stage must be invisible")
    assert(Tables.documents(spark, servingDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet == docsBefore,
      "readers must still see the prior serving version whole")
    // The prior version is not just readable — it is still INDEXED:
    // phrase search serves from the postings artifact, no rebuild.
    assert(!PostingsIndex.ensure(spark, servingDir,
      PostingsIndex.defaultDir(servingDir)),
      "the prior snapshot's index must still read as current")
    assert(graft.queries.TextOps.queries("q_phrase_search")(spark, servingDir)
      .collect() != null)

    // Re-publish completes the flip atomically: same content → the
    // snapshot advances but every artifact fingerprint-matches → no-op.
    val r = Publish.run(spark, src.resolve("dump.jsonl").toString, out)
    assert(graft.ext.Versioned.currentVersion(servingDir) > v1)
    assert(!r.index.postingsBuilt && !r.index.bpeTrained,
      "an unchanged corpus re-published must not rebuild any artifact")
    graft.queries.Det.releasePins(spark)
  }

  test("retained snapshots time-travel: yesterday's corpus queryable after today's publish") {
    def dump(dir: java.nio.file.Path, ids: Seq[Long], tag: String): String = {
      val p = dir.resolve(s"dump_$tag.jsonl")
      java.nio.file.Files.write(p,
        ids.map(i => jline(i, freshText(s"$tag$i"))).mkString("\n").getBytes("UTF-8"))
      p.toString
    }
    val src = java.nio.file.Files.createTempDirectory("publish_src_tt")
    val out = java.nio.file.Files.createTempDirectory("publish_out_tt").toString
    Publish.run(spark, dump(src, 300L until 306L, "a"), out, keepVersions = 3)
    Publish.run(spark, dump(src, 310L until 318L, "b"), out, keepVersions = 3)
    val vs = Publish.servingVersions(out)
    assert(vs.size == 2, s"both snapshots retained under keep=3: $vs")
    // Time travel: the SAME reader API over the retained snapshot dir.
    val oldIds = Tables.documents(spark, Publish.servingVersionDir(out, vs.head))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val curIds = Tables.documents(spark, s"$out/serving")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(oldIds == (300L until 306L).toSet, s"v${vs.head} must serve dump A: $oldIds")
    assert(curIds == (310L until 318L).toSet, s"CURRENT must serve dump B: $curIds")
    // The publish's own change report: diff of the two retained
    // snapshots — dump A's docs removed, dump B's added, nothing shared.
    val diff = Publish.servingDiff(spark, out).collect()
      .map(r => (r.getAs[String]("class"), r.getAs[Long]("n")))
      .groupBy(_._1).map { case (c, xs) => c -> xs.map(_._2).sum }
    assert(diff == Map("added" -> 8L, "removed" -> 6L),
      s"servingDiff must report the publish's effect: $diff")
    // Default retention (keep=2) trims the window back to two snapshots.
    Publish.run(spark, dump(src, 320L until 324L, "c"), out)
    val vs2 = Publish.servingVersions(out)
    assert(vs2.size == 2 && vs2.last > vs.last,
      s"keep=2 publish must retain only the new snapshot and its predecessor: $vs2")
    assert(!new java.io.File(Publish.servingVersionDir(out, vs.head)).exists(),
      "the oldest snapshot must be swept once retention passes it")
    graft.queries.Det.releasePins(spark)
  }

  test("time-travel queries serve from the RETAINED index versions — zero builds, zero currency jobs") {
    def dump(dir: java.nio.file.Path, ids: Seq[Long], tag: String): String = {
      val p = dir.resolve(s"dump_$tag.jsonl")
      java.nio.file.Files.write(p,
        ids.map(i => jline(i, freshText(s"$tag$i"))).mkString("\n").getBytes("UTF-8"))
      p.toString
    }
    val src = java.nio.file.Files.createTempDirectory("publish_src_pin")
    val out = java.nio.file.Files.createTempDirectory("publish_out_pin").toString
    Publish.run(spark, dump(src, 400L until 406L, "pa"), out, keepVersions = 3)
    val vA = Publish.servingVersions(out).last
    Publish.run(spark, dump(src, 410L until 418L, "pb"), out, keepVersions = 3)
    val snapA = Publish.servingVersionDir(out, vA)
    // The manifest pairs snapshot A with the index versions built FOR it.
    assert(Publish.pinnedIndexDir(snapA, "postings").nonEmpty,
      "the retained snapshot must resolve its paired postings version")
    val postDir = PostingsIndex.defaultDir(s"$out/serving")
    val vPost = graft.ext.Versioned.currentVersion(postDir)
    // Query dump A AFTER dump B committed: the r13 VERDICT #3 "done"
    // criterion — ZERO index builds (artifact version unmoved) and zero
    // currency jobs (the CurrencySpec computeRuns-counter trick).
    val runsBefore = graft.ext.Currency.computeRuns.get()
    val phrase = graft.queries.TextOps.queries("q_phrase_search")(spark, snapA)
      .collect()
    val lm = graft.queries.TextOps.queries("q_lm_score")(spark, snapA)
      .collect()
    assert(graft.ext.Currency.computeRuns.get() == runsBefore,
      "a time-travel serve must run zero currency jobs")
    assert(graft.ext.Versioned.currentVersion(postDir) == vPost,
      "a time-travel serve must not build any index version")
    assert(!new java.io.File(PostingsIndex.defaultDir(snapA), "CURRENT").exists(),
      "no artifact may be keyed off the snapshot path (the pre-r14 full-rebuild trap)")
    // And the pinned serve answers from YESTERDAY's corpus exactly.
    assert(lm.map(_.getAs[Long]("doc_id")).toSet.subsetOf((400L until 406L).toSet),
      "the pinned LM must score dump A's documents")
    assert(lm.map(_.toSeq).toSeq ==
      graft.queries.TextOps.lmScoreInSession(spark, snapA).collect().map(_.toSeq).toSeq,
      "pinned-artifact results must equal the in-session chain over the snapshot")
    assert(phrase != null)
    // Index retention follows serving retention (r14): after a THIRD
    // publish under keep=3, the oldest retained snapshot's paired
    // artifact version is still on disk and still serves with zero
    // builds — the window no longer trims back to the artifact's
    // default keep=2.
    Publish.run(spark, dump(src, 420L until 425L, "pc"), out, keepVersions = 3)
    assert(Publish.servingVersions(out).size == 3)
    assert(Publish.pinnedIndexDir(snapA, "postings").nonEmpty,
      "the oldest snapshot's paired postings version must survive two later publishes")
    val vPost2 = graft.ext.Versioned.currentVersion(postDir)
    val runs2 = graft.ext.Currency.computeRuns.get()
    val lm2 = graft.queries.TextOps.queries("q_lm_score")(spark, snapA).collect()
    assert(graft.ext.Currency.computeRuns.get() == runs2 &&
      graft.ext.Versioned.currentVersion(postDir) == vPost2,
      "the oldest snapshot must still serve pinned — zero builds, zero currency jobs")
    assert(lm2.map(_.toSeq).toSeq == lm.map(_.toSeq).toSeq,
      "the pinned serve must be version-stable across later publishes")
    graft.queries.Det.releasePins(spark)
  }

  test("a pinned time-travel serve survives an index-root relocation (manifest re-resolution)") {
    // r14 ADVICE #5: the manifest records absolute artifact dirs as of
    // publish time; after the index root moves (a different
    // SPARK_GRAFT_INDEX_ROOT at read time), pinnedIndexDir must
    // re-resolve under the current root instead of silently degrading
    // every time-travel serve to a rebuild.
    def dump(dir: java.nio.file.Path, ids: Seq[Long], tag: String): String = {
      val p = dir.resolve(s"dump_$tag.jsonl")
      java.nio.file.Files.write(p,
        ids.map(i => jline(i, freshText(s"$tag$i"))).mkString("\n").getBytes("UTF-8"))
      p.toString
    }
    val rootA = java.nio.file.Files.createTempDirectory("idx_root_a").toString
    val rootB = rootA + "_relocated"
    sys.props("graft.index.root") = rootA
    try {
      val src = java.nio.file.Files.createTempDirectory("publish_src_reloc")
      val out = java.nio.file.Files.createTempDirectory("publish_out_reloc").toString
      Publish.run(spark, dump(src, 600L until 606L, "ra"), out, keepVersions = 3)
      val vA = Publish.servingVersions(out).last
      Publish.run(spark, dump(src, 610L until 618L, "rb"), out, keepVersions = 3)
      val snapA = Publish.servingVersionDir(out, vA)
      val before = graft.queries.TextOps.queries("q_lm_score")(spark, snapA)
        .collect().map(_.toSeq).toSeq
      assert(Publish.pinnedIndexDir(snapA, "postings")
        .exists(_.startsWith(rootA)), "sanity: pinned under root A before the move")
      // Relocate the ENTIRE artifact tree and point the root at it.
      java.nio.file.Files.move(java.nio.file.Paths.get(rootA),
        java.nio.file.Paths.get(rootB))
      sys.props("graft.index.root") = rootB
      graft.queries.Det.releasePins(spark) // path-keyed memos name root A
      val pinned = Publish.pinnedIndexDir(snapA, "postings")
      assert(pinned.exists(_.startsWith(rootB)),
        s"the pinned version must re-resolve under the relocated root, got $pinned")
      val runsBefore = graft.ext.Currency.computeRuns.get()
      val after = graft.queries.TextOps.queries("q_lm_score")(spark, snapA)
        .collect().map(_.toSeq).toSeq
      assert(graft.ext.Currency.computeRuns.get() == runsBefore,
        "the relocated pinned serve must still run zero currency jobs (no rebuild)")
      assert(after == before,
        "the relocated pinned serve must answer exactly as before the move")
    } finally {
      sys.props -= "graft.index.root"
      graft.queries.Det.releasePins(spark)
    }
  }

  test("a text-only publish skips the vector artifacts and still serves postings/BPE") {
    val lines = (0L until 6L).map(i => jline(100 + i, freshText(s"t$i")))
    val src = java.nio.file.Files.createTempDirectory("publish_src2")
    java.nio.file.Files.write(src.resolve("dump.jsonl"),
      lines.mkString("\n").getBytes("UTF-8"))
    val out = java.nio.file.Files.createTempDirectory("publish_out2").toString
    val r = Publish.run(spark, src.resolve("dump.jsonl").toString, out)
    assert(r.servingVecs == 0 && !r.index.annBuilt && !r.index.rpBuilt)
    assert(r.index.annAction == "skipped", s"got $r")
    assert(r.index.postingsBuilt && r.index.bpeTrained)
    graft.queries.Det.releasePins(spark)
  }
}
