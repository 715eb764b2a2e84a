package graft

import org.apache.spark.sql.functions._
import graft.ext.PostingsIndex
import graft.queries.TextOps

/** Persisted phrase-search postings (r11 VERDICT #6): build-once →
  * serve-from-disk with NO corpus re-tokenization in the warm plan,
  * append-only maintenance that equals a full rebuild exactly, and
  * compaction that preserves content while bounding the file count.
  */
class PostingsIndexSpec extends SparkSpec {
  import spark.implicits._

  private def mkCorpus(rows: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("postings_corpus").toString
    rows.map { case (id, t) => (id, t, "en", "s0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private val baseRows = Seq(
    1L -> "the quick brown fox jumps over the lazy dog",
    2L -> "a quick brown fox is quick brown fox again",
    3L -> "completely unrelated text with no shared phrase",
    4L -> "the quick brown fox sat still")

  test("served phrase search equals the in-session chain; warm plan never touches the corpus text") {
    val corpus = mkCorpus(baseRows)
    val inSession = TextOps.phraseSearchInSession(spark, corpus)
      .collect().map(_.toSeq)
    val served = TextOps.queries("q_phrase_search")(spark, corpus)
    assert(served.collect().map(_.toSeq).toSeq == inSession.toSeq,
      "served-from-postings result must equal the in-session tokenization")
    // Warm plan: scans the postings artifact, not documents.parquet —
    // no re-tokenization (split/posexplode over text) anywhere.
    val fresh = spark.newSession()
    val qe = TextOps.queries("q_phrase_search")(fresh, corpus).queryExecution
    val phys = qe.executedPlan.toString
    assert(phys.contains(PostingsIndex.defaultDir(corpus)),
      "warm plan must scan the persisted postings dir")
    assert(!phys.contains("documents.parquet"),
      "warm plan must not re-read the corpus text")
    assert(!qe.optimizedPlan.toString.toLowerCase.contains("posexplode"),
      "warm plan must not re-tokenize")
    // v4: the phrase-frequency ranking reads the pre-aggregated
    // gramstats segments (schema (phrase, df)) — the 3-way (doc_id,
    // pos±k) self-join over the whole postings table is gone from the
    // warm plan; only the lookup's two alignment joins remain.
    assert(phys.contains("struct<phrase:string,df:bigint>"),
      "warm ranking must scan the gramstats table")
    // The query-time ranking aggregation (countDistinct over the gram
    // self-join) is what v4 removed — its absence is the discriminator.
    assert(!qe.optimizedPlan.toString.toLowerCase.contains("count(distinct"),
      "warm ranking must not recompute per-phrase document frequencies")
    graft.queries.Det.releasePins(fresh)
  }

  test("ensure builds once; a second ensure is a pure load") {
    val corpus = mkCorpus(baseRows)
    val idx = java.nio.file.Files.createTempDirectory("postings_idx").toString
    assert(PostingsIndex.ensure(spark, corpus, idx), "first ensure must build")
    assert(!PostingsIndex.ensure(spark, corpus, idx), "second ensure must load")
  }

  test("a corpus swap under the same path invalidates the index") {
    val corpus = mkCorpus(baseRows)
    val idx = java.nio.file.Files.createTempDirectory("postings_idx2").toString
    assert(PostingsIndex.ensure(spark, corpus, idx))
    val bigger = mkCorpus(baseRows :+ (9L -> "one more document arrives"))
    assert(PostingsIndex.ensure(spark, bigger, idx),
      "doc-count mismatch must force a rebuild")
  }

  test("append-only maintenance equals a full rebuild over the union (exact)") {
    val corpus = mkCorpus(baseRows)
    val newRows = Seq(
      10L -> "the quick brown fox returns once more",
      11L -> "fresh words never seen before")
    val union = mkCorpus(baseRows ++ newRows)
    val idx = java.nio.file.Files.createTempDirectory("postings_idx3").toString
    PostingsIndex.ensure(spark, corpus, idx)
    val newDocs = newRows.map { case (id, t) => (id, t, "en", "s0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    PostingsIndex.appendDocs(spark, idx, newDocs)
    val idxFull = java.nio.file.Files.createTempDirectory("postings_idx4").toString
    PostingsIndex.ensure(spark, union, idxFull)
    def rows(d: String) = PostingsIndex.postings(spark, d)
      .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    assert(rows(idx) == rows(idxFull),
      "appended postings must equal a from-scratch build over the union")
    // Same postings content ⇒ same lookup result; the multiset equality
    // above is the stronger pin, this guards the lookup stays non-trivial.
    assert(TextOps.phraseSearchInSession(spark, union).collect().nonEmpty)
    graft.queries.Det.releasePins(spark)
  }

  test("streaming postings maintenance equals batch appends (foreachBatch twin)") {
    val corpus = mkCorpus(baseRows)
    val idx = java.nio.file.Files.createTempDirectory("postings_idx_s").toString
    PostingsIndex.ensure(spark, corpus, idx)
    val newRows = Seq(
      30L -> "streamed words arrive in order",
      31L -> "the quick brown fox streams too")
    val union = mkCorpus(baseRows ++ newRows)
    val idxFull = java.nio.file.Files.createTempDirectory("postings_idx_sf").toString
    PostingsIndex.ensure(spark, union, idxFull)
    // Two doc files → two micro-batches through the stream.
    val src = java.nio.file.Files.createTempDirectory("postings_src").toString
    for ((r, i) <- newRows.zipWithIndex)
      Seq(r).map { case (id, t) => (id, t, "en", "s0", t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .coalesce(1).write.mode("overwrite").parquet(s"$src/drop_$i")
    // File source needs a flat dir of files: re-land the parts.
    val flat = java.nio.file.Files.createTempDirectory("postings_src_flat").toString
    for (i <- newRows.indices) {
      val part = new java.io.File(s"$src/drop_$i").listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$flat/d$i.parquet"))
    }
    val q = PostingsIndex.postingsStream(spark, flat, idx, maxFilesPerTrigger = Some(1))
    q.processAllAvailable(); q.stop()
    def rows(d: String) = PostingsIndex.postings(spark, d)
      .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    assert(rows(idx) == rows(idxFull),
      "stream-maintained postings must equal a from-scratch build over the union")
    // The stream appends through the same appendDocs, so the BM25 and
    // phrase-ranking tables are maintained too — pin all three.
    def trows(d: String) = PostingsIndex.termstats(spark, d)
      .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    assert(trows(idx) == trows(idxFull),
      "stream-maintained termstats must equal a from-scratch build")
    def grows(d: String) = PostingsIndex.gramstats(spark, d)
      .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    assert(grows(idx) == grows(idxFull),
      "stream-maintained gramstats partials must sum to a from-scratch build")
  }

  // Query terms of q_bm25_search (TextOps.Bm25QueryTerms) woven into a
  // corpus where tf, df and dl all vary, so ranking is non-degenerate.
  private val bm25Rows = Seq(
    1L -> "vector hash merge window vector",
    2L -> "hash table scan with a hash and another hash inside",
    3L -> "merge sort merge join merge again merge forever and the window",
    4L -> "window functions over a window frame",
    5L -> "no query term appears in this document at all",
    6L -> "vector")

  test("served BM25 equals the in-session statistics; warm plan scans only termstats") {
    val corpus = mkCorpus(bm25Rows)
    val inSession = TextOps.bm25SearchInSession(spark, corpus).collect().map(_.toSeq)
    assert(inSession.nonEmpty, "spec corpus must score at least one document")
    val served = TextOps.queries("q_bm25_search")(spark, corpus)
    assert(served.collect().map(_.toSeq).toSeq == inSession.toSeq,
      "artifact-served BM25 must equal the in-session sufficient statistics")
    // Warm plan: the termstats table feeds the scan (not the raw
    // postings, not the corpus text), the term IN (…) predicate reaches
    // the parquet source, and nothing re-tokenizes.
    val fresh = spark.newSession()
    val qe = TextOps.queries("q_bm25_search")(fresh, corpus).queryExecution
    val phys = qe.executedPlan.toString
    // (The plan string elides long paths, so pin the termstats scan by
    // its read schema — only that table carries (dl, tf).)
    assert(phys.contains("struct<term:string,doc_id:bigint,dl:bigint,tf:bigint>"),
      "warm plan must scan the termstats table")
    assert(!phys.contains("documents.parquet"), "warm plan must not re-read the corpus")
    assert(phys.contains("PushedFilters: [In(term,") || phys.contains("In(term, ["),
      s"the query-term IN filter must reach the parquet scan:\n$phys")
    assert(!qe.optimizedPlan.toString.toLowerCase.contains("posexplode"),
      "warm plan must not re-tokenize")
    graft.queries.Det.releasePins(fresh)
  }

  test("served top-terms and vocab-coverage equal in-session tokenization; warm plans never re-tokenize") {
    // r14 VERDICT #4: the last text report families that re-split the
    // corpus per run now aggregate the termstats artifact (v6 carries
    // source denormalized on).
    val corpus = mkCorpus(baseRows)
    for ((name, inSession) <- Seq(
        "q_top_terms" -> TextOps.topTermsInSession,
        "q_vocab_coverage" -> TextOps.vocabCoverageInSession)) {
      val expect = inSession(spark, corpus).collect().map(_.toSeq).toSeq
      assert(expect.nonEmpty, s"$name spec corpus must produce rows")
      val served = TextOps.queries(name)(spark, corpus).collect().map(_.toSeq).toSeq
      assert(served == expect, s"$name served from termstats must equal in-session")
      val fresh = spark.newSession()
      val qe = TextOps.queries(name)(fresh, corpus).queryExecution
      assert(!qe.executedPlan.toString.contains("documents.parquet"),
        s"$name warm plan must not read the corpus")
      assert(!qe.optimizedPlan.toString.toLowerCase.contains("explode"),
        s"$name warm plan must not re-tokenize")
      graft.queries.Det.releasePins(fresh)
    }
    graft.queries.Det.releasePins(spark)
  }

  test("corpus-report family serves from docmeta; equals in-session on a null-bearing corpus; never re-tokenizes") {
    // r15 (v9): length deciles, the mixture report, and both mixture
    // samplers read the per-document metadata table instead of the
    // corpus text. The corpus includes a NULL-text doc to pin the
    // coalesce(−1) reconstruction of the engine's legacy size(NULL)
    // (docmeta stores the clean NULL).
    val dir = java.nio.file.Files.createTempDirectory("postings_dmeta").toString
    Seq((1L, "alpha beta gamma delta", "en", "s0", 22L),
        (2L, "one two", "en", "s0", 7L),
        (3L, null.asInstanceOf[String], "en", "s0", 0L),
        (4L, "vector window hash merge table scan", "de", "s1", 36L),
        (5L, "tiny", "de", "s1", 4L),
        (6L, "a b c d e f g h i j k l", "en", "s1", 23L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    for ((name, inSession) <- Seq(
        "q_len_deciles" -> TextOps.lenDecilesInSession,
        "q_corpus_mix" -> TextOps.corpusMixInSession,
        "q_mix_resample" -> TextOps.mixResampleInSession,
        "q_mix_temperature" -> TextOps.mixTemperatureInSession,
        "q_shard_shuffle" -> graft.queries.Sampling.shardShuffleInSession,
        "q_shard_stats" -> graft.queries.Sampling.shardStatsInSession,
        "q_split_assign" -> TextOps.splitAssignInSession)) {
      val expect = inSession(spark, dir).collect().map(_.toSeq).toSeq
      assert(expect.nonEmpty, s"$name spec corpus must produce rows")
      val served = SparkEntry.queries(name)(spark, dir).collect().map(_.toSeq).toSeq
      assert(served == expect, s"$name served from docmeta must equal in-session")
      val fresh = spark.newSession()
      val qe = SparkEntry.queries(name)(fresh, dir).queryExecution
      assert(!qe.executedPlan.toString.contains("documents.parquet"),
        s"$name warm plan must not read the corpus")
      assert(!qe.optimizedPlan.toString.toLowerCase.contains("split("),
        s"$name warm plan must not re-tokenize")
      graft.queries.Det.releasePins(fresh)
    }
    graft.queries.Det.releasePins(spark)
  }

  test("served per-doc BM25 keyword extraction equals in-session tokenization; warm plan never re-tokenizes") {
    // r15: q_text_bm25 (the keyword-extraction report) serves from
    // termstats. The corpus includes a NULL-text doc to pin the two
    // statistics that differ subtly between the paths: n_docs counts it
    // (meta n vs count over docLen rows) while avgdl ignores it (no
    // termstats rows vs a NULL dl davg skips).
    val dir = java.nio.file.Files.createTempDirectory("postings_tb25").toString
    Seq((1L, "vector hash merge window vector", "en", "s0", 30L),
        (2L, "hash table scan with a hash and another hash inside", "en", "s0", 50L),
        (3L, null.asInstanceOf[String], "en", "s0", 0L),
        (4L, "window functions over a window frame", "en", "s1", 36L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val expect = TextOps.textBm25InSession(spark, dir).collect().map(_.toSeq).toSeq
    assert(expect.nonEmpty, "spec corpus must extract keywords")
    val served = TextOps.queries("q_text_bm25")(spark, dir).collect().map(_.toSeq).toSeq
    assert(served == expect,
      "artifact-served keyword extraction must equal the in-session tokenization")
    val fresh = spark.newSession()
    val qe = TextOps.queries("q_text_bm25")(fresh, dir).queryExecution
    assert(!qe.executedPlan.toString.contains("documents.parquet"),
      "warm plan must not read the corpus")
    // posexplode of the bounded top-3 array is fine; re-tokenization
    // (split over text) is what serving removed.
    assert(!qe.optimizedPlan.toString.toLowerCase.contains("split("),
      "warm plan must not re-tokenize")
    graft.queries.Det.releasePins(fresh)
    graft.queries.Det.releasePins(spark)
  }

  test("impact-ordered BM25 (WAND lite): fast path is exact, and low-tf files of a high-df term are skippable") {
    // r14 VERDICT #5: the (term, tf, doc_id) layout + termsummary bounds
    // let top-20 retrieval read the high-impact postings and provably
    // exclude everything below the 20th partial score.
    // 30 "fat" docs carry all four query terms at tf=6 (the true top-20);
    // 1000 docs carry a single tf=1 "vector" (the Zipf bulk the fast
    // path must skip); 200 docs carry no query term (idf mass).
    val fat = (0L until 30L).map(i =>
      i -> Array.fill(6)("vector hash merge window").mkString(" "))
    val thin = (100L until 1100L).map(i => i -> "vector filler")
    val none = (2000L until 2200L).map(i => i -> "filler words only here")
    val corpus = mkCorpus(fat ++ thin ++ none)
    // Force a multi-file-per-term layout: build under many range
    // partitions with AQE coalescing off, so the high-df term's tf=1 run
    // spans whole files — the shape a 100 TB build gets naturally from
    // 128 MB-targeted files.
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    val prevCoalesce = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.shuffle.partitions", "64")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    val idx = java.nio.file.Files.createTempDirectory("postings_idx_wand").toString
    try PostingsIndex.ensure(spark, corpus, idx)
    finally {
      spark.conf.set("spark.sql.shuffle.partitions", prev)
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", prevCoalesce)
    }
    // Exactness: the fast path (20+ phase-1 docs, bounds hold) must
    // reproduce the full-scan algebra bit-for-bit.
    val inSession = TextOps.bm25SearchInSession(spark, corpus).collect().map(_.toSeq).toSeq
    val fastBefore = TextOps.bm25FastPathRuns.get()
    val served = TextOps.bm25SearchOverIdx(spark, idx).collect().map(_.toSeq).toSeq
    assert(TextOps.bm25FastPathRuns.get() == fastBefore + 1,
      "this corpus shape must take the impact-ordered fast path, not the fallback")
    assert(served == inSession, "impact-ordered serve must equal the full-scan result")
    assert(served.size == 20 && served.forall(r => fat.exists(_._1 == r.head)),
      "sanity: the top-20 must be fat docs (the bound-exercising shape)")
    // The phase-1 predicate reaches the parquet scan.
    val probe = PostingsIndex.termstats(spark, idx)
      .filter(col("term").isin("vector", "hash", "merge", "window") && col("tf") >= 2)
      .queryExecution.executedPlan.toString
    assert(probe.contains("GreaterThanOrEqual(tf,2)") && probe.contains("In(term,"),
      s"phase-1 filters must push to parquet:\n$probe")
    // Footer math: among the files whose term range admits 'vector',
    // requiring tf >= 2 must exclude a STRICT, non-trivial subset (the
    // tf=1 run lands in files whose tf max is 1 under the v6 layout).
    val files = graft.ext.Compaction.dataFiles(spark,
      s"${graft.ext.Versioned.committedDir(idx)}/termstats").map(_._1)
    val ranges = files.map { f =>
      val r = spark.read.parquet(f).agg(
        min(col("term")), max(col("term")), min(col("tf")), max(col("tf"))).head()
      (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))
    }
    val termFiles = ranges.filter(r => r._1 <= "vector" && "vector" <= r._2)
    val highFiles = termFiles.filter(_._4 >= 2L)
    assert(termFiles.size >= 4,
      s"spec layout must spread the high-df term over several files, got ${termFiles.size}")
    assert(highFiles.size < termFiles.size,
      s"tf >= 2 must skip files: ${highFiles.size} of ${termFiles.size} remain")
    assert(highFiles.size <= math.max(2, termFiles.size / 4),
      s"the skip must be the BULK of the term's files (Zipf tf=1 mass): " +
        s"${highFiles.size} of ${termFiles.size}")
    graft.queries.Det.releasePins(spark)
  }

  test("dl-aware WAND bounds engage on a score-compressed long-document corpus the dl-free bounds must refuse") {
    // r15 (NOTES round-16 candidate): every query term appears in every
    // doc (df = N → idf tiny, scores compressed) and every doc is
    // exactly 64 tokens. The dl-free sup s(tf, dl=tf) then overstates
    // the skipped tf=1 mass so much that potential/ub < 1.5 and the
    // precheck MUST route to the full scan; the v8 per-(term, tf)
    // min_dl = 64 tightens both sides (s(1,64) = 1.0 vs s(1,1) ≈ 1.67
    // at avgdl 64) and the fast path engages — exactly, same oracle.
    val terms = Seq("vector", "hash", "merge", "window")
    def fill(id: Long, n: Int) = (0 until n).map(i => s"f${id}x$i")
    val fat = (0L until 40L).map { i =>
      i -> (terms.flatMap(t => Seq(t, t, t, t)) ++ fill(i, 48)).mkString(" ")
    }
    val thin = (100L until 1300L).map { i =>
      i -> (terms ++ fill(i, 60)).mkString(" ")
    }
    val corpus = mkCorpus(fat ++ thin)
    val idx = java.nio.file.Files.createTempDirectory("postings_idx_dlw").toString
    PostingsIndex.ensure(spark, corpus, idx)
    // Pin the corpus shape the argument rests on: avgdl = 64 and, per
    // query term, df = N with tf levels {1, 4}.
    val (n, sumDl) = PostingsIndex.corpusStats(spark, idx)
    assert(n == 1240L && sumDl == 1240L * 64, s"corpus shape drifted: n=$n sumDl=$sumDl")
    // The dl-FREE precheck refuses this corpus: recompute its exact
    // bound algebra from the artifact's termsummary and assert the
    // refusal condition (ubAll * 1.5 >= potential) — so a fast-path
    // engagement below is attributable to the dl-aware rung alone.
    val avgdl = sumDl.toDouble / n
    def sOld(tf: Long) = (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * tf / avgdl))
    val summ = PostingsIndex.termSummary(spark, idx)
      .filter(col("term").isin(terms: _*))
      .collect().map(r => (r.getAs[Long]("df"), r.getAs[Long]("min_tf"),
        r.getAs[Long]("max_tf")))
    assert(summ.length == 4 && summ.forall(s => s._1 == 1240L && s._2 == 1L && s._3 == 4L),
      s"term stats drifted: ${summ.toSeq}")
    def idf(df: Long) = (n - df + 0.5) / (df + 0.5)
    val ubOld = summ.filter(_._2 < 2).map(s => idf(s._1) * sOld(1L)).sum
    val potOld = summ.map(s => idf(s._1) * sOld(s._3)).sum
    assert(ubOld * 1.5 >= potOld,
      s"spec premise: the dl-free precheck must refuse ($ubOld vs $potOld)")
    // The serve itself: dl-aware bounds engage and stay exact.
    val inSession = TextOps.bm25SearchInSession(spark, corpus).collect().map(_.toSeq).toSeq
    val fastBefore = TextOps.bm25FastPathRuns.get()
    val dlBefore = TextOps.bm25DlBoundRuns.get()
    val served = TextOps.bm25SearchOverIdx(spark, idx).collect().map(_.toSeq).toSeq
    assert(TextOps.bm25FastPathRuns.get() == fastBefore + 1,
      "the dl-aware bounds must take the impact-ordered fast path here")
    assert(TextOps.bm25DlBoundRuns.get() == dlBefore + 1,
      "the engagement must be attributed to the v8 tfdl bounds")
    assert(served == inSession, "dl-aware serve must equal the full-scan result")
    assert(served.size == 20 && served.forall(r => r.head.asInstanceOf[Long] < 40L),
      "sanity: the top-20 must be the tf=4 docs")
    graft.queries.Det.releasePins(spark)
  }

  test("appended termstats equal a from-scratch build; corpus stats merge exactly") {
    val corpus = mkCorpus(bm25Rows)
    val newRows = Seq(
      10L -> "vector window vector window hash",
      11L -> "entirely novel words only")
    val union = mkCorpus(bm25Rows ++ newRows)
    val idx = java.nio.file.Files.createTempDirectory("postings_idx_bm").toString
    val idxFull = java.nio.file.Files.createTempDirectory("postings_idx_bmf").toString
    PostingsIndex.ensure(spark, corpus, idx)
    PostingsIndex.appendDocs(spark, idx,
      newRows.map { case (id, t) => (id, t, "en", "s0", t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
    PostingsIndex.ensure(spark, union, idxFull)
    def stats(d: String) = PostingsIndex.termstats(spark, d)
      .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    assert(stats(idx) == stats(idxFull),
      "appended termstats must equal a from-scratch build over the union")
    assert(PostingsIndex.corpusStats(spark, idx) ==
      PostingsIndex.corpusStats(spark, idxFull),
      "merged (n_docs, sum_dl) must equal the from-scratch corpus stats")
    // gramstats: the appended segment's df partials must SUM to the
    // from-scratch document frequencies (the LSM merge law).
    def gstats(d: String) = PostingsIndex.gramstats(spark, d)
      .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    assert(gstats(idx) == gstats(idxFull),
      "summed gramstats partials must equal a from-scratch build over the union")
    // tfdl (v8): cnt partials sum and min_dl folds to the from-scratch
    // per-(term, tf) metadata — the dl-aware WAND bound's merge law.
    def tdl(d: String) = PostingsIndex.tfDl(spark, d)
      .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    assert(tdl(idx) == tdl(idxFull),
      "folded tfdl partials must equal a from-scratch build over the union")
    // docmeta (v9): per-document, so appended rows must equal the
    // from-scratch union build row-for-row.
    def dmeta(d: String) = PostingsIndex.docMeta(spark, d)
      .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    assert(dmeta(idx) == dmeta(idxFull),
      "appended docmeta must equal a from-scratch build over the union")
  }

  test("compaction bounds the file count and preserves content") {
    val corpus = mkCorpus(baseRows)
    val idx = java.nio.file.Files.createTempDirectory("postings_idx5").toString
    PostingsIndex.ensure(spark, corpus, idx)
    val before = PostingsIndex.postings(spark, idx)
      .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    val add = Seq((20L, "more words to append", "en", "s0", 20L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    PostingsIndex.appendDocs(spark, idx, add, compactFileBound = 1)
    for (t <- Seq("postings", "termstats", "gramstats",
                  "bigramstats", "docgrams", "docids", "tfdl", "docmeta")) {
      val files = graft.ext.Compaction.dataFiles(spark, PostingsIndex.tablePath(idx, t))
      assert(files.size <= 1, s"bound-1 compaction must leave ≤1 $t file, got ${files.size}")
    }
    val after = PostingsIndex.postings(spark, idx)
      .filter(col("doc_id") =!= 20L)
      .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    assert(after == before, "compaction must preserve every pre-existing posting")
    // The gramstats compaction is the only one that REWRITES row content
    // (groupBy-sum of df partials) — verify the merged content against a
    // from-scratch build over the same union, not just the file count.
    val unionIdx = java.nio.file.Files.createTempDirectory("postings_idx5u").toString
    PostingsIndex.ensure(spark,
      mkCorpus(baseRows :+ (20L -> "more words to append")), unionIdx)
    def gstats(d: String) = PostingsIndex.gramstats(spark, d)
      .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    assert(gstats(idx) == gstats(unionIdx),
      "merge-compacted gramstats must equal a from-scratch build's frequencies")
  }

  private def docsDf(rows: Seq[(Long, String)]) =
    rows.map { case (id, t) => (id, t, "en", "s0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("two racing appendDocs interleave: the loser FAILS, the committed artifact is one winner's increment") {
    val corpus = mkCorpus(baseRows)
    val idx = java.nio.file.Files.createTempDirectory("postings_idx_race").toString
    PostingsIndex.ensure(spark, corpus, idx)
    val docsA = docsDf(Seq(40L -> "writer a brings these words"))
    val docsB = docsDf(Seq(50L -> "writer b brings other words"))
    // Deterministic interleave: writer B's ENTIRE append runs inside
    // writer A's promote (after A staged off the same parent, before A's
    // CAS check) — the exact lost-update window the r13 VERDICT named.
    @volatile var fired = false
    graft.ext.Versioned.beforePromote = (dir, _) => {
      if (!fired && dir == idx) {
        fired = true
        PostingsIndex.appendDocs(spark, idx, docsB)
      }
    }
    try {
      intercept[graft.ext.Versioned.ConcurrentCommitException] {
        PostingsIndex.appendDocs(spark, idx, docsA)
      }
    } finally graft.ext.Versioned.beforePromote = (_, _) => ()
    val ids = PostingsIndex.docids(spark, idx)
      .collect().map(_.getLong(0)).toSet
    assert(ids == baseRows.map(_._1).toSet + 50L,
      s"the committed artifact must be EXACTLY the winner's increment, got $ids")
    assert(!ids.contains(40L), "the loser's increment must not be published")
    // The loser's orphaned staging is collected by the next clean commit.
    PostingsIndex.appendDocs(spark, idx, docsDf(Seq(60L -> "a clean later append")))
    assert(PostingsIndex.docids(spark, idx).count() == baseRows.size + 2)
  }

  test("a replayed increment is REFUSED (disjointness gate) and recorded in the audit log") {
    val corpus = mkCorpus(baseRows)
    val idx = java.nio.file.Files.createTempDirectory("postings_idx_gate").toString
    PostingsIndex.ensure(spark, corpus, idx)
    val inc = docsDf(Seq(10L -> "vector words here", 11L -> "more new words"))
    PostingsIndex.appendDocs(spark, idx, inc)
    val vAfter = graft.ext.Versioned.currentVersion(idx)
    val statsBefore = PostingsIndex.termstats(spark, idx)
      .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    // The at-least-once failure mode: the same drop file delivered twice.
    intercept[graft.ext.Gate.OverlappingAppendException] {
      PostingsIndex.appendDocs(spark, idx, inc)
    }
    assert(graft.ext.Versioned.currentVersion(idx) == vAfter,
      "a refused append must not commit")
    assert(PostingsIndex.termstats(spark, idx)
      .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq == statsBefore,
      "a refused append must not touch the statistics")
    val audit = spark.read.parquet(s"$idx/audit")
      .collect().map(_.getAs[String]("action"))
    assert(audit.contains("refused"), s"the refusal must be audited: ${audit.toSeq}")
    // An internally-duplicated increment is refused up front too.
    intercept[graft.ext.Gate.OverlappingAppendException] {
      PostingsIndex.appendDocs(spark, idx,
        docsDf(Seq(70L -> "dup", 70L -> "dup again")))
    }
    // A non-monotone but DISJOINT increment still appends — the exact
    // anti-join path (min id 6 ≤ committed max 11, no overlap).
    PostingsIndex.appendDocs(spark, idx, docsDf(Seq(6L -> "older id fresh doc")))
    assert(PostingsIndex.docids(spark, idx).count() == baseRows.size + 3)
  }

  test("a replayed stream drop file surfaces as an audited refusal; the stream keeps going") {
    val corpus = mkCorpus(baseRows)
    val idx = java.nio.file.Files.createTempDirectory("postings_idx_sgate").toString
    PostingsIndex.ensure(spark, corpus, idx)
    val flat = java.nio.file.Files.createTempDirectory("postings_sgate_src").toString
    def land(rows: Seq[(Long, String)], name: String): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("postings_sgate_tmp").toString
      docsDf(rows).coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$flat/$name.parquet"))
    }
    val q = PostingsIndex.postingsStream(spark, flat, idx, maxFilesPerTrigger = Some(1))
    try {
      land(Seq(80L -> "streamed fresh words"), "d0")
      q.processAllAvailable()
      val statsAfterFirst = PostingsIndex.termstats(spark, idx)
        .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
      land(Seq(80L -> "streamed fresh words"), "d1") // the replay
      q.processAllAvailable()
      assert(PostingsIndex.termstats(spark, idx)
        .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq == statsAfterFirst,
        "a replayed drop file must not double-count tf/df")
      land(Seq(81L -> "the stream moves on"), "d2")
      q.processAllAvailable()
      assert(PostingsIndex.docids(spark, idx)
        .collect().map(_.getLong(0)).toSet == baseRows.map(_._1).toSet ++ Set(80L, 81L),
        "the stream must survive the refusal and admit later disjoint batches")
      val actions = spark.read.parquet(s"$idx/audit")
        .orderBy("decided_at_ms").collect().map(_.getAs[String]("action")).toSeq
      assert(actions == Seq("appended", "refused", "appended"), s"got $actions")
    } finally q.stop()
  }

  test("served LM score equals the in-session chain; appends keep the equality; warm plan trains nothing") {
    val corpus = mkCorpus(bm25Rows)
    val inSession = TextOps.lmScoreInSession(spark, corpus).collect().map(_.toSeq)
    assert(inSession.nonEmpty)
    val served = TextOps.queries("q_lm_score")(spark, corpus)
    assert(served.collect().map(_.toSeq).toSeq == inSession.toSeq,
      "artifact-served LM score must equal the in-session derivation")
    // Warm plan: artifact scans only — no corpus read, no bigram explode.
    val fresh = spark.newSession()
    val qe = TextOps.queries("q_lm_score")(fresh, corpus).queryExecution
    val phys = qe.executedPlan.toString
    assert(!phys.contains("documents.parquet"),
      "warm LM serve must not read the corpus")
    assert(!qe.optimizedPlan.toString.toLowerCase.contains("explode"),
      "warm LM serve must not re-derive bigrams")
    graft.queries.Det.releasePins(fresh)
    // Appended artifact ≡ in-session over the union (the partials sum).
    val newRows = Seq(90L -> "vector hash vector hash merge",
                      91L -> "novel bigram text entirely")
    val idx = PostingsIndex.defaultDir(corpus)
    PostingsIndex.appendDocs(spark, idx, docsDf(newRows))
    val union = mkCorpus(bm25Rows ++ newRows)
    assert(TextOps.lmScoreOver(
        PostingsIndex.docgrams(spark, idx), PostingsIndex.bigramLm(spark, idx))
      .collect().map(_.toSeq).toSeq ==
      TextOps.lmScoreInSession(spark, union).collect().map(_.toSeq).toSeq,
      "summed bigram partials must reproduce the from-scratch LM over the union")
    graft.queries.Det.releasePins(spark)
  }

  test("segment blooms prove disjointness WITHOUT reading committed ids; coverage survives appends") {
    val corpus = mkCorpus(baseRows) // ids 1..4
    val idx = java.nio.file.Files.createTempDirectory("postings_idx_bloom").toString
    PostingsIndex.ensure(spark, corpus, idx)
    val bl = PostingsIndex.blooms(spark, idx)
    assert(bl.nonEmpty, "a build must land a bloom over its ids")
    // Non-monotone but DISJOINT increment (id 0 ≤ committed max): the
    // bloom rung must prove it without evaluating the committed table —
    // the by-name committedIds THROWS if touched.
    graft.ext.Gate.requireDisjoint(docsDf(Seq(0L -> "entirely new low id")),
      "doc_id", 4L,
      { fail("the committed id table must not be read when blooms prove disjointness") },
      "postings", bl)
    // A replayed id IS a bloom candidate → the exact semi-join rung runs
    // and refuses (bloom false positives can only ADD work, never admit).
    intercept[graft.ext.Gate.OverlappingAppendException] {
      graft.ext.Gate.requireDisjoint(docsDf(Seq(1L -> "replayed")),
        "doc_id", 4L, PostingsIndex.docids(spark, idx), "postings", bl)
    }
    // Appends maintain the COMPLETENESS invariant: parent bloom linked
    // forward + the increment's own segment; every committed id covered.
    PostingsIndex.appendDocs(spark, idx,
      docsDf(Seq(10L -> "ten new words", 11L -> "eleven other words")))
    val bl2 = PostingsIndex.blooms(spark, idx)
    assert(bl2.size == 2, s"parent segment + increment segment, got ${bl2.size}")
    for (id <- Seq(1L, 2L, 3L, 4L, 10L, 11L))
      assert(bl2.exists(_.mightContainLong(id)),
        s"committed id $id must be covered by some segment bloom")
    // Past the bound, segments collapse to ONE bloom over docids — the
    // compaction amortization — and coverage still holds.
    PostingsIndex.appendDocs(spark, idx,
      docsDf(Seq(12L -> "twelve arrives later")), compactFileBound = 1)
    val bl3 = PostingsIndex.blooms(spark, idx)
    assert(bl3.size == 1, s"bound-1 append must collapse the bloom segments, got ${bl3.size}")
    for (id <- Seq(1L, 2L, 3L, 4L, 10L, 11L, 12L))
      assert(bl3.exists(_.mightContainLong(id)),
        s"rebuilt bloom must cover every committed id incl. $id")
  }

  test("merged gramstats are memoized per committed version (second serve re-aggregates nothing)") {
    val corpus = mkCorpus(baseRows)
    val idx = java.nio.file.Files.createTempDirectory("postings_idx_memo").toString
    PostingsIndex.ensure(spark, corpus, idx)
    val g1 = PostingsIndex.gramstats(spark, idx)
    val g2 = PostingsIndex.gramstats(spark, idx)
    assert(g1 eq g2,
      "the second serve of one committed version must reuse the pinned merge")
    // A version bump (append) self-invalidates through the path key.
    PostingsIndex.appendDocs(spark, idx, docsDf(Seq(95L -> "new gramstats segment here")))
    val g3 = PostingsIndex.gramstats(spark, idx)
    assert(!(g3 eq g1), "a new committed version must re-merge its segments")
    graft.queries.Det.releasePins(spark)
  }

  test("served contamination equals the in-session check; appends keep it; corpus side reads hashes") {
    // v7: the decontamination corpus side scans (doc_id, ghash) off the
    // artifact; only hash-candidate docs are re-tokenized for the exact
    // string verify, so hash false positives can never surface and
    // zero-candidate docs are provably clean (no false negatives).
    val rows = (0L until 20L).map(i => i -> s"bench doc number $i with shared marker phrase alpha beta gamma delta epsilon zeta") ++
      Seq(
        30L -> "train doc clean of any benchmark span entirely original text here today",
        31L -> "leading words then shared marker phrase alpha beta gamma delta epsilon zeta and a tail",
        32L -> "short doc under eight")
    val corpus = mkCorpus(rows)
    val expect = TextOps.queries("q_text_contamination")(spark, corpus)
      .collect().map(_.toSeq).toSeq
    val served = TextOps.queries("q_text_contamination_served")(spark, corpus)
      .collect().map(_.toSeq).toSeq
    assert(served == expect, "artifact-served contamination must equal the in-session check")
    assert(served.exists(r => r(0) == 31L && r(4) == true),
      "sanity: the planted contaminated doc must be flagged")
    // The corpus side of the warm plan reads the hashed gram table; the
    // bench side's doc_id < 20 reaches the documents scan.
    val fresh = spark.newSession()
    val phys = TextOps.queries("q_text_contamination_served")(fresh, corpus)
      .queryExecution.executedPlan.toString
    assert(phys.contains("struct<doc_id:bigint,ghash:bigint>"),
      "warm corpus side must scan the contamgrams artifact")
    assert(phys.contains("LessThan(doc_id,20)"),
      s"the bench filter must push to the documents scan:\n$phys")
    graft.queries.Det.releasePins(fresh)
    // Appends maintain both v7 tables exactly (per-document functions):
    // appended artifact ≡ from-scratch build over the union.
    val add = Seq(40L ->
      "appended doc also carrying shared marker phrase alpha beta gamma delta epsilon zeta inside")
    val union = mkCorpus(rows ++ add)
    val idxApp = java.nio.file.Files.createTempDirectory("postings_idx_contam_a").toString
    PostingsIndex.ensure(spark, corpus, idxApp)
    PostingsIndex.appendDocs(spark, idxApp, docsDf(add))
    val idxU = java.nio.file.Files.createTempDirectory("postings_idx_contam_u").toString
    PostingsIndex.ensure(spark, union, idxU)
    for (t <- Seq("contamgrams", "contamdocs")) {
      def tab(d: String) = spark.read
        .parquet(s"${graft.ext.Versioned.committedDir(d)}/$t")
        .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
      assert(tab(idxApp) == tab(idxU),
        s"appended $t must equal a from-scratch build over the union")
    }
    graft.queries.Det.releasePins(spark)
  }

  test("a reader pointed at an unbuilt or dead-staged dir fails explicitly (no uncommitted reads)") {
    // r14 ADVICE #4: a dir without CURRENT is a pinned version root ONLY
    // when it is v<N>-shaped (what Publish.pinnedIndexDir hands out);
    // anything else — an unbuilt artifact, a dead staged dir from a
    // killed commit — must raise "no committed version", not read
    // uncommitted staged data or throw a confusing path error.
    val empty = java.nio.file.Files.createTempDirectory("postings_unbuilt").toString
    val e = intercept[IllegalArgumentException] {
      PostingsIndex.postings(spark, empty)
    }
    assert(e.getMessage.contains("no committed version"), e.getMessage)
    intercept[IllegalArgumentException] {
      graft.ext.AnnIndex.membership(spark, empty)
    }
    // A dead staged dir under the artifact root is equally refused.
    val corpus = mkCorpus(baseRows)
    val idx = java.nio.file.Files.createTempDirectory("postings_idx_guard").toString
    PostingsIndex.ensure(spark, corpus, idx)
    val deadRoot = java.nio.file.Files.createTempDirectory("postings_dead").toString
    intercept[IllegalArgumentException] {
      PostingsIndex.postings(spark, s"$deadRoot/staging")
    }
    // The sanctioned pinned shape still reads: the committed version dir
    // itself is a valid root (what a time-travel manifest resolves to).
    val pinned = graft.ext.Versioned.committedDir(idx)
    assert(PostingsIndex.postings(spark, pinned).count() > 0)
  }

  test("nGramStats generalizes the gram layout: n=2/3 reproduce the LM/phrase tables; n=4 partials sum exactly") {
    // r14 VERDICT #7: one n-parameterized machinery behind gramstats
    // (n=3) and bigramstats (n=2) — and 4/5-gram contamination serving
    // opens under the same LSM partial-sum law.
    val docs = docsDf(baseRows)
    // Hand-computed n=4 golden on doc 1 ("the quick brown fox jumps over
    // the lazy dog" → six 4-grams, all distinct).
    val d1 = PostingsIndex.nGramStats(docsDf(baseRows.take(1)), 4).collect()
    assert(d1.length == 6 && d1.forall(r =>
      r.getAs[Long]("c") == 1L && r.getAs[Long]("gdf") == 1L), s"got ${d1.toSeq}")
    assert(d1.exists(_.getAs[String]("gram") == "the quick brown fox"))
    // The partial-sum law per n: stats over disjoint halves, summed,
    // equal stats over the union — the exact merge the LSM segments and
    // compaction both rely on.
    for (n <- Seq(2, 3, 4, 5)) {
      val whole = PostingsIndex.nGramStats(docs, n)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .sortBy(t => (t._1, t._2)).toSeq
      val summed = PostingsIndex.nGramStats(docsDf(baseRows.take(2)), n)
        .unionByName(PostingsIndex.nGramStats(docsDf(baseRows.drop(2)), n))
        .groupBy(col("gram"), col("w1"))
        .agg(sum(col("c")).as("c"), sum(col("gdf")).as("gdf"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .sortBy(t => (t._1, t._2)).toSeq
      assert(summed == whole, s"n=$n partials must sum to the union stats")
    }
    // The specialized tables are the n=2/3 instances, schemas unchanged.
    assert(PostingsIndex.gramDfs(docs).columns.toSeq == Seq("phrase", "df"))
    assert(PostingsIndex.bigramStats(docs).columns.toSeq == Seq("gram", "w1", "c12", "gdf"))
  }

  test("a commit killed at ANY step leaves a servable index; the next commit sweeps it") {
    // The r12 ADVICE #2 crash window: the old rm-then-move compaction
    // could leave NO postings dir while meta survived. Under the version
    // chain every pre-flip state is a half-staged dir CURRENT never
    // names — simulate the worst kill (garbage postings, no meta).
    val corpus = mkCorpus(baseRows)
    val idx = java.nio.file.Files.createTempDirectory("postings_idx_kill").toString
    PostingsIndex.ensure(spark, corpus, idx)
    val committed = graft.ext.Versioned.currentVersion(idx)
    val before = PostingsIndex.postings(spark, idx)
      .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    val v = graft.ext.Versioned.nextVersion(idx)
    val dead = new java.io.File(graft.ext.Versioned.versionDir(idx, v), "postings")
    dead.mkdirs()
    java.nio.file.Files.write(new java.io.File(dead, "part-garbage.parquet").toPath,
      Array[Byte](0))
    assert(graft.ext.Versioned.currentVersion(idx) == committed)
    assert(PostingsIndex.postings(spark, idx)
      .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq == before,
      "a reader concurrent with the crash must serve the committed version whole")
    // The next real append commits ABOVE the dead dir and sweeps it.
    val add = Seq((30L, "fresh words after the crash", "en", "s0", 27L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    PostingsIndex.appendDocs(spark, idx, add)
    assert(graft.ext.Versioned.currentVersion(idx) > v)
    assert(!new java.io.File(graft.ext.Versioned.versionDir(idx, v)).exists(),
      "promote must sweep the dead staging dir")
    val grown = PostingsIndex.postings(spark, idx)
    assert(grown.filter(col("doc_id") === 30L).count() > 0)
    assert(grown.filter(col("doc_id") =!= 30L)
      .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq == before,
      "the surviving commit must carry every committed posting forward")
  }

  test("a STREAM batch racing a scheduled commit retries and BOTH increments land (stream alive)") {
    // r14 VERDICT #1's "done" criterion: before retryingCommit, the CAS
    // loser DIED — a postingsStream micro-batch losing to a cron
    // IndexRun commit propagated ConcurrentCommitException out of
    // foreachBatch and terminated the stream. Now the batch re-stages
    // off the winner's commit and the stream moves on.
    val corpus = mkCorpus(baseRows)
    val idx = java.nio.file.Files.createTempDirectory("postings_idx_race_s").toString
    PostingsIndex.ensure(spark, corpus, idx)
    val flat = java.nio.file.Files.createTempDirectory("postings_src_race").toString
    def land(rows: Seq[(Long, String)], name: String): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("postings_race_tmp").toString
      docsDf(rows).coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$flat/$name.parquet"))
    }
    // The scheduled maintainer commits INSIDE the stream batch's first
    // promote (after the batch staged, before its CAS check) — the
    // deterministic interleave of a stream append losing to a cron run.
    @volatile var fired = false
    graft.ext.Versioned.beforePromote = (dir, _) => {
      if (!fired && dir == idx) {
        fired = true
        PostingsIndex.appendDocs(spark, idx,
          docsDf(Seq(50L -> "scheduled maintainer increment")))
      }
    }
    val q = PostingsIndex.postingsStream(spark, flat, idx, maxFilesPerTrigger = Some(1))
    try {
      land(Seq(40L -> "streamed increment racing the cron"), "b0")
      q.processAllAvailable()
      val ids = PostingsIndex.docids(spark, idx)
        .collect().map(_.getLong(0)).toSet
      assert(ids == Set(1L, 2L, 3L, 4L, 40L, 50L),
        s"BOTH increments must land after the retry, got $ids")
      // The audit names the retry: the stream batch's append committed
      // off the RACER's version, not its original parent.
      val appends = spark.read.parquet(s"$idx/audit")
        .filter(col("action") === "appended").orderBy("decided_at_ms")
        .collect().map(_.getAs[String]("reason")).toSeq
      // Claim order: the stream batch claimed v2 first, so the racer
      // claimed v3 and won; the retry re-staged off v3 as v4.
      assert(appends == Seq("v1 -> v3", "v3 -> v4"),
        s"the retried stream append must re-stage off the winner, got $appends")
      // The stream is ALIVE: it admits the next batch.
      graft.ext.Versioned.beforePromote = (_, _) => ()
      land(Seq(60L -> "post race batch still flows"), "b1")
      q.processAllAvailable()
      assert(PostingsIndex.docids(spark, idx)
        .filter(col("doc_id") === 60L).count() == 1,
        "the stream must keep processing after surviving the race")
    } finally {
      graft.ext.Versioned.beforePromote = (_, _) => ()
      q.stop()
    }
    // The retried state equals a sequential schedule of the same three
    // increments — losing a race costs a wasted staging, never content.
    val seq = mkCorpus(baseRows ++ Seq(50L -> "scheduled maintainer increment",
      40L -> "streamed increment racing the cron",
      60L -> "post race batch still flows"))
    val idxSeq = java.nio.file.Files.createTempDirectory("postings_idx_race_seq").toString
    PostingsIndex.ensure(spark, seq, idxSeq)
    def rows(d: String) = PostingsIndex.postings(spark, d)
      .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    assert(rows(idx) == rows(idxSeq),
      "the raced schedule must converge to the sequential result")
    graft.queries.Det.releasePins(spark)
  }
}
