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

  private def stageDocs(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("corpus_docs").toString
    rows.map { case (id, t) => (id, t, "en", "s0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def freshText(tag: String): String =
    (0 until 40).map(i => s"${tag}w$i").mkString(" ")

  test("containment stage drops a quoted passage the jaccard stage passes; off by default") {
    import spark.implicits._
    // Doc 2 is a verbatim 10-token span of doc 1: containment 1.0 but
    // jaccard ≈ 0.21 — invisible to stage 3. Doc 3 is unrelated.
    val long = (0 until 40).map(i => s"cw$i").mkString(" ")
    val quote = (10 until 20).map(i => s"cw$i").mkString(" ")
    val dir = stageDocs(Seq((1L, long), (2L, quote), (3L, freshText("zz"))))
    val off = java.nio.file.Files.createTempDirectory("corpus_cont_off").toString
    val r0 = CorpusPipeline.run(spark, dir, off)
    assert(r0.afterNear == 3 && r0.afterContain == 3, s"default off: pass-through: $r0")
    val out = java.nio.file.Files.createTempDirectory("corpus_cont").toString
    val r = CorpusPipeline.run(spark, dir, out, containmentThreshold = Some(0.9))
    assert(r.afterNear == 3, s"jaccard stage must not see the quote pair: $r")
    assert(r.afterContain == 2, s"the contained quote must drop: $r")
    val cleanIds = spark.read.parquet(s"$out/corpus_clean")
      .select("doc_id").as[Long].collect().toSet
    assert(cleanIds == Set(1L, 3L), s"container kept, quote dropped: $cleanIds")
    val dropped = spark.read.parquet(s"$out/contained").collect()
    assert(dropped.length == 1 && dropped.head.getAs[Long]("doc_id") == 2L
      && dropped.head.getAs[Long]("dup_of") == 1L
      && dropped.head.getAs[String]("drop_reason") == "contained_in_doc",
      s"audited drop names the container: ${dropped.toSeq}")
    graft.queries.Det.releasePins(spark)
  }

  private def stageDocsWithUrl(rows: Seq[(Long, String, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("corpus_docs_url").toString
    rows.map { case (id, t, u) => (id, t, "en", "s0", t.length.toLong, u) }
      .toDF("doc_id", "text", "lang", "source", "n_chars", "url")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("URL-dedup stage collapses canonical-URL variants, null urls pass through") {
    import spark.implicits._
    // Three DISTINCT texts (so no text-dedup stage can touch them) whose
    // urls all canonicalize to https://example.com/a — only the URL
    // stage can collapse them. Doc 4 has a null url (must survive), doc
    // 5 a genuinely different url (must survive).
    val dir = stageDocsWithUrl(Seq(
      (1L, freshText("a"), "https://WWW.Example.com:443/a/?utm_source=x#f"),
      (2L, freshText("b"), "https://example.com/a"),
      (3L, freshText("c"), "https://example.com/a/?utm_campaign=y"),
      (4L, freshText("d"), null),
      (5L, freshText("e"), "https://example.com/other")))
    val out = java.nio.file.Files.createTempDirectory("corpus_url").toString
    val r = CorpusPipeline.run(spark, dir, out)
    assert(r.afterContam == 5, s"all five docs reach the URL stage: $r")
    assert(r.afterUrl == 3, s"exactly the two url-variant losers drop: $r")
    assert(r.afterExact == 3 && r.afterNear == 3,
      "text stages see already-distinct texts: no further drops")
    val cleanIds = spark.read.parquet(s"$out/corpus_clean")
      .select("doc_id").as[Long].collect().toSet
    assert(cleanIds == Set(1L, 4L, 5L), s"keep min-id per canon key: $cleanIds")
    val dropped = spark.read.parquet(s"$out/url_dropped").collect()
    assert(dropped.map(_.getAs[Long]("doc_id")).toSet == Set(2L, 3L))
    assert(dropped.forall(_.getAs[Long]("keeper_doc") == 1L))
    assert(dropped.forall(_.getAs[String]("canon_url") == "https://example.com/a"))
    assert(dropped.forall(_.getAs[String]("drop_reason") == "url_canonical_dup"))
    graft.queries.Det.releasePins(spark)
  }

  test("urlDedup switch off: url column present but stage is a pass-through") {
    val dir = stageDocsWithUrl(Seq(
      (1L, freshText("a"), "https://example.com/a"),
      (2L, freshText("b"), "https://WWW.example.com/a/")))
    val out = java.nio.file.Files.createTempDirectory("corpus_url_off").toString
    val r = CorpusPipeline.run(spark, dir, out, urlDedup = false)
    assert(r.afterContam == 2 && r.afterUrl == 2, s"switch off must not drop: $r")
    graft.queries.Det.releasePins(spark)
  }

  test("boilerplate stage: banner cut everywhere, banner-only doc drops, cut texts collapse in exact dedup") {
    import spark.implicits._
    // An 8-token banner in every doc (df = 6 ≥ 3 → boilerplate). Docs
    // 1-3 carry unique tails; docs 4 and 5 share an IDENTICAL tail, so
    // after the banner cut they become exact duplicates — the C4
    // ordering rationale (boilerplate masks exact duplication). Doc 6
    // is banner-only → empty after the cut → dropped.
    val banner = "cookie notice accept all to continue reading here"
    val tail45 = "t1 t2 t3 t4 t5 t6 t7 t8"
    val dir = stageDocs(Seq(
      (1L, s"$banner a1 a2 a3 a4 a5 a6 a7 a8"),
      (2L, s"$banner b1 b2 b3 b4 b5 b6 b7 b8"),
      (3L, s"$banner c1 c2 c3 c4 c5 c6 c7 c8"),
      (4L, s"$banner $tail45"),
      (5L, s"$banner $tail45"),
      (6L, banner)))
    val out = java.nio.file.Files.createTempDirectory("corpus_boiler").toString
    val r = CorpusPipeline.run(spark, dir, out, boilerplateMinDocs = Some(3))
    assert(r.afterUrl == 6, s"all six docs reach the boilerplate stage: $r")
    assert(r.afterBoiler == 5, s"exactly the banner-only doc drops: $r")
    assert(r.afterExact == 4, s"de-bannered twins collapse in exact dedup: $r")
    val clean = spark.read.parquet(s"$out/corpus_clean")
    val texts = clean.select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(texts.keySet == Set(1L, 2L, 3L, 4L))
    assert(texts(1L) == "a1 a2 a3 a4 a5 a6 a7 a8", s"banner must be cut: ${texts(1L)}")
    assert(texts(4L) == tail45)
    val log = spark.read.parquet(s"$out/boiler_removed").collect()
    assert(log.map(_.getAs[Long]("doc_id")).toSet == Set(1L, 2L, 3L, 4L, 5L, 6L))
    val reasons = log.map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("drop_reason")).toMap
    assert(reasons(6L) == "all_boilerplate")
    assert(reasons(1L) == "boilerplate_segments_cut")
    graft.queries.Det.releasePins(spark)
  }

  test("boilerplate stage off by default: same fixture passes through untouched") {
    val banner = "cookie notice accept all to continue reading here"
    val dir = stageDocs(Seq(
      (1L, s"$banner a1 a2 a3 a4 a5 a6 a7 a8"),
      (2L, s"$banner b1 b2 b3 b4 b5 b6 b7 b8"),
      (3L, s"$banner c1 c2 c3 c4 c5 c6 c7 c8")))
    val out = java.nio.file.Files.createTempDirectory("corpus_boiler_off").toString
    val r = CorpusPipeline.run(spark, dir, out)
    assert(r.afterBoiler == r.afterUrl, s"default off: no boilerplate drops: $r")
    val texts = spark.read.parquet(s"$out/corpus_clean")
      .select("text").collect().map(_.getString(0))
    assert(texts.forall(_.startsWith(banner)), "default off: text untouched")
    graft.queries.Det.releasePins(spark)
  }

  test("contamination stage drops benchmark-overlapping docs and logs ratios") {
    import spark.implicits._
    val benchText = freshText("bm")
    val dir = stageDocs(Seq(
      (1L, freshText("a")),
      (2L, benchText),        // verbatim eval answer: every 8-gram hits
      (3L, freshText("c"))))
    val out = java.nio.file.Files.createTempDirectory("corpus_contam").toString
    val bench = Seq(benchText).toDF("text")
    val r = CorpusPipeline.run(spark, dir, out, benchmark = Some(bench))
    assert(r.afterQuality == 3 && r.afterContam == 2,
      s"exactly the planted verbatim doc must drop: $r")
    assert(r.afterSemantic == 2, "no embeddings given: semantic stage is a pass-through")
    val logged = spark.read.parquet(s"$out/contaminated").collect()
    assert(logged.length == 1 && logged.head.getAs[Long]("doc_id") == 2L)
    assert(logged.head.getAs[Double]("overlap_ratio") == 1.0)
    assert(logged.head.getAs[String]("drop_reason") == "benchmark_8gram_overlap")
    val cleanIds = spark.read.parquet(s"$out/corpus_clean")
      .select("doc_id").as[Long].collect().toSet
    assert(cleanIds == Set(1L, 3L))
    graft.queries.Det.releasePins(spark)
  }

  test("model-gate stage drops below-threshold docs with logged scores") {
    import spark.implicits._
    // The model is md5-hashed weights, so "good" and "bad" tokens are
    // found by evaluating the SAME weight function the operator uses:
    // build one doc from strongly-negative-weight tokens and one from
    // strongly-positive ones, and the gate must separate them exactly.
    def w(t: String): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
      ((hex(0).toInt * 7 + hex(1).toInt * 13) % 101 - 50) / 100.0
    }
    val cands = (0 until 4000).map(i => s"tok$i")
    // 40 tokens each so the heuristic gate (length, uniq, stopwords)
    // passes BOTH docs — only the model separates them.
    val negToks = cands.sortBy(w).take(40)
    val posToks = cands.sortBy(t => -w(t)).take(40)
    assert(negToks.map(w).sum / 40 < -0.1 && posToks.map(w).sum / 40 > 0.1,
      "token search must find clearly-signed weights")
    val dir = stageDocs(Seq(
      (1L, posToks.mkString(" ")),
      (2L, negToks.mkString(" "))))
    val out = java.nio.file.Files.createTempDirectory("corpus_model").toString
    val r = CorpusPipeline.run(spark, dir, out, modelMinScore = Some(0.5))
    assert(r.afterQuality == 2, s"both docs must pass the heuristic gate: $r")
    assert(r.afterModel == 1, s"exactly the negative-weight doc must drop: $r")
    val logged = spark.read.parquet(s"$out/model_dropped").collect()
    assert(logged.length == 1 && logged.head.getAs[Long]("doc_id") == 2L)
    assert(logged.head.getAs[Double]("model_score") < 0.5)
    assert(logged.head.getAs[String]("drop_reason") == "model_score_below_min")
    val cleanIds = spark.read.parquet(s"$out/corpus_clean")
      .select("doc_id").as[Long].collect().toSet
    assert(cleanIds == Set(1L))
    graft.queries.Det.releasePins(spark)
  }

  test("semantic stage drops the paraphrase pair token shingles cannot see") {
    import spark.implicits._
    // A and B share ZERO tokens (no shingle overlap — the near-dedup
    // stage provably keeps both) but carry the same embedding: the
    // paraphrase class only the semantic stage catches. C is orthogonal.
    val dir = stageDocs(Seq(
      (1L, freshText("a")),
      (2L, freshText("b")),
      (3L, freshText("c"))))
    val e1 = Array.tabulate(64)(i => if (i == 0) 1f else 0f)
    val e2 = Array.tabulate(64)(i => if (i == 1) 1f else 0f)
    val emb = Seq((1L, e1), (2L, e1), (3L, e2)).toDF("doc_id", "embedding")
    val out = java.nio.file.Files.createTempDirectory("corpus_sem").toString
    val r = CorpusPipeline.run(spark, dir, out, embeddings = Some(emb))
    assert(r.afterNear == 3, "shingle dedup must not see the paraphrase pair")
    assert(r.afterSemantic == 2, s"the paraphrase loser must drop: $r")
    val cleanIds = spark.read.parquet(s"$out/corpus_clean")
      .select("doc_id").as[Long].collect().toSet
    assert(cleanIds == Set(1L, 3L), "min-id doc survives, orthogonal doc untouched")
    // The verified pair is exactly (1, 2) at cosine 1.
    val pairs = CorpusPipeline.semanticNearDupPairs(spark, emb, 0.98).collect()
    assert(pairs.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSeq
      == Seq((1L, 2L)))
    assert(pairs.head.getAs[Double]("cosine") == 1.0)
    graft.queries.Det.releasePins(spark)
  }

  private def stageSourcedDocs(rows: Seq[(Long, String, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("corpus_docs").toString
    rows.map { case (id, t, src) => (id, t, "en", src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("per-source cap stage enforces the quota, logs drops, and is growth-stable") {
    import spark.implicits._
    // s0 is over-represented (8 docs), s1 is under quota (2 docs).
    val s0 = (1L to 8L).map(i => (i, freshText(s"s0d$i"), "s0"))
    val s1 = Seq((20L, freshText("s1da"), "s1"), (21L, freshText("s1db"), "s1"))
    val dir = stageSourcedDocs(s0 ++ s1)
    val out = java.nio.file.Files.createTempDirectory("corpus_cap").toString
    val r = CorpusPipeline.run(spark, dir, out, maxDocsPerSource = Some(3))
    assert(r.afterSemantic == 10 && r.afterCap == 5,
      s"8 -> 3 capped + 2 under quota expected: $r")
    val clean = spark.read.parquet(s"$out/corpus_clean")
    val bySrc = clean.groupBy(col("source")).agg(count(lit(1)).as("n"))
      .collect().map(x => x.getAs[String]("source") -> x.getAs[Long]("n")).toMap
    assert(bySrc == Map("s0" -> 3L, "s1" -> 2L))
    val keptS0 = clean.filter(col("source") === "s0")
      .select("doc_id").as[Long].collect().toSet
    // Drops are logged with rank and reason (the auditable-drop rule).
    val logged = spark.read.parquet(s"$out/capped").collect()
    assert(logged.length == 5 && logged.forall(
      x => x.getAs[String]("drop_reason") == "per_source_cap"
        && x.getAs[Int]("source_rank") > 3))
    // Growth stability: new docs in OTHER sources never change s0's
    // selection (the md5 rank is domain-local and id-pure).
    val grown = stageSourcedDocs(s0 ++ s1 ++
      Seq((30L, freshText("s2da"), "s2"), (31L, freshText("s2db"), "s2"),
          (32L, freshText("s2dc"), "s2"), (33L, freshText("s2dd"), "s2")))
    val out2 = java.nio.file.Files.createTempDirectory("corpus_cap2").toString
    val r2 = CorpusPipeline.run(spark, grown, out2, maxDocsPerSource = Some(3))
    assert(r2.afterCap == 8, s"3 + 2 + 3 expected: $r2")
    val keptS0Grown = spark.read.parquet(s"$out2/corpus_clean")
      .filter(col("source") === "s0").select("doc_id").as[Long].collect().toSet
    assert(keptS0Grown == keptS0, "s0's kept set moved under unrelated growth")
    graft.queries.Det.releasePins(spark)
  }
}
