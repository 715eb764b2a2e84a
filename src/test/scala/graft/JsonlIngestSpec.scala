package graft

import graft.ext.JsonlIngest

/** JSONL ingest contract: clean rows land schema-typed, every broken
  * line — malformed JSON, type-violating field, missing required field —
  * quarantines with its raw text, and clean + quarantined covers the
  * input exactly (nothing silently dropped).
  */
class JsonlIngestSpec extends SparkSpec {

  private def stage(lines: Seq[String]): String = {
    val dir = java.nio.file.Files.createTempDirectory("jsonl_src")
    java.nio.file.Files.write(dir.resolve("part0.jsonl"),
      lines.mkString("\n").getBytes("UTF-8"))
    dir.toString
  }

  test("dirty JSONL splits into typed clean rows and raw quarantine, covering the input") {
    val lines = Seq(
      """{"doc_id": 1, "text": "alpha beta gamma", "lang": "en", "source": "s0", "n_chars": 16}""",
      """{"doc_id": 2, "text": "delta epsilon", "lang": "en", "source": "s1", "n_chars": 13}""",
      """{"doc_id": 3, "text": "zeta", "lang": null, "source": "s0", "n_chars": 4}""", // optional null: CLEAN
      """{"doc_id": 4, "text": "eta theta" BROKEN""",                                  // malformed JSON
      """{"doc_id": "not-a-number", "text": "iota", "lang": "en", "source": "s1", "n_chars": 4}""", // type violation
      """{"text": "kappa lambda", "lang": "en", "source": "s0", "n_chars": 12}"""      // missing required doc_id
    )
    val src = stage(lines)
    val (clean, quarantine) = JsonlIngest.readSplit(
      spark, src, JsonlIngest.documentsSchema, required = Seq("doc_id", "text"))
    val cleanRows = clean.collect()
    assert(cleanRows.map(_.getAs[Long]("doc_id")).sorted.toSeq == Seq(1L, 2L, 3L))
    assert(cleanRows.forall(!_.isNullAt(clean.columns.indexOf("text"))))
    val q = quarantine.collect().map(_.getString(0))
    assert(q.length == 3, s"expected 3 quarantined lines, got ${q.length}: ${q.mkString(" | ")}")
    assert(q.exists(_.contains("BROKEN")), "malformed line must carry its raw text")
    assert(q.exists(_.contains("not-a-number")), "type-violating line must quarantine raw")
    assert(q.exists(_.contains("kappa lambda")), "missing-required line must quarantine")
    assert(cleanRows.length + q.length == lines.length, "clean + quarantine must cover the input")
  }

  test("extra JSON fields are tolerated, not quarantined (schema evolution)") {
    // Crawl dumps grow fields over time; under an explicit schema the
    // unknown keys are a non-event — the row parses clean and the extra
    // fields are simply not read. (Quarantining them would turn every
    // upstream addition into a fake corruption storm.)
    val src = stage(Seq(
      """{"doc_id": 50, "text": "row with extras", "lang": "en", "source": "s0", "n_chars": 15, "crawl_ts": "2026-01-01", "meta": {"k": 1}}"""))
    val (clean, quarantine) = JsonlIngest.readSplit(
      spark, src, JsonlIngest.documentsSchema, required = Seq("doc_id", "text"))
    assert(clean.count() == 1 && quarantine.count() == 0)
    assert(clean.head.getAs[Long]("doc_id") == 50L)
  }

  test("ingestDocuments lands parquet the whole operator suite can read") {
    val src = stage(Seq(
      """{"doc_id": 10, "text": "the quick brown fox jumps", "lang": "en", "source": "s0", "n_chars": 25}""",
      """{"doc_id": 11, "text": "the quick brown fox jumps", "lang": "en", "source": "s0", "n_chars": 25}""",
      "not json at all"))
    val out = java.nio.file.Files.createTempDirectory("jsonl_out").toString
    val (nClean, nQuarantine) = JsonlIngest.ingestDocuments(spark, src, out)
    assert(nClean == 2 && nQuarantine == 1)
    // The landed layout is a drop-in corpus dir: run a real operator on it.
    val exact = graft.queries.Dedup.queries("q_dedup_exact")(spark, out).collect()
    assert(exact.length == 2, "one row per ingested doc")
    assert(exact.forall(_.getAs[Long]("group_size") == 2L),
      "the two identical ingested docs must share one exact-dup group")
    assert(exact.count(_.getAs[Boolean]("is_duplicate")) == 1,
      "exactly the non-canonical doc is flagged duplicate")
    graft.queries.Det.releasePins(spark)
  }

  private def stageGz(lines: Seq[String]): String = {
    val dir = java.nio.file.Files.createTempDirectory("jsonl_gz_src")
    val out = new java.util.zip.GZIPOutputStream(
      java.nio.file.Files.newOutputStream(dir.resolve("part0.jsonl.gz")))
    try out.write(lines.mkString("\n").getBytes("UTF-8")) finally out.close()
    dir.toString
  }

  test("gzipped JSONL ingests transparently (decompress-and-land pass)") {
    val src = stageGz(Seq(
      """{"doc_id": 20, "text": "compressed alpha", "lang": "en", "source": "s0", "n_chars": 16}""",
      """{"doc_id": 21, "text": "compressed beta", "lang": "en", "source": "s0", "n_chars": 15}""",
      "broken { gz line"))
    val out = java.nio.file.Files.createTempDirectory("jsonl_gz_out").toString
    // landPartitions: a single .gz decompresses in one task; re-spread the
    // landing so downstream scans aren't shaped by the archive layout.
    val (nClean, nQuarantine) = JsonlIngest.ingestDocuments(spark, src, out,
      landPartitions = Some(2))
    assert(nClean == 2 && nQuarantine == 1)
    val landedFiles = new java.io.File(s"$out/documents.parquet")
      .listFiles().count(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    assert(landedFiles == 2, s"landPartitions must re-spread the one-task gz read: $landedFiles files")
    assert(spark.read.parquet(s"$out/documents.parquet")
      .where("doc_id IN (20, 21)").count() == 2)
    graft.queries.Det.releasePins(spark)
  }

  test("clean re-ingest over the same outDir removes the stale quarantine") {
    val out = java.nio.file.Files.createTempDirectory("jsonl_reingest_out").toString
    val dirty = stage(Seq(
      """{"doc_id": 30, "text": "good row", "lang": "en", "source": "s0", "n_chars": 8}""",
      "utterly broken"))
    val (_, q1) = JsonlIngest.ingestDocuments(spark, dirty, out)
    assert(q1 == 1 && new java.io.File(s"$out/quarantine").exists())
    // The fixed input re-lands over the same outDir: zero corrupt rows
    // must leave NO quarantine dir behind (stale files would read as
    // phantom corruption against the new landing).
    val fixed = stage(Seq(
      """{"doc_id": 30, "text": "good row", "lang": "en", "source": "s0", "n_chars": 8}""",
      """{"doc_id": 31, "text": "fixed row", "lang": "en", "source": "s0", "n_chars": 9}"""))
    val (n2, q2) = JsonlIngest.ingestDocuments(spark, fixed, out)
    assert(n2 == 2 && q2 == 0)
    assert(!new java.io.File(s"$out/quarantine").exists(),
      "stale quarantine must be deleted on a clean ingest")
    graft.queries.Det.releasePins(spark)
  }

  test("quarantine repair loop: relaxed policy recovers rows, quarantine shrinks") {
    val out = java.nio.file.Files.createTempDirectory("jsonl_repair_out").toString
    val src = stage(Seq(
      """{"doc_id": 40, "text": "kept row", "lang": "en", "source": "s0", "n_chars": 8}""",
      """{"doc_id": 41, "lang": "en", "source": "s0", "n_chars": 0}""", // missing text → quarantined
      """broken beyond repair {"""))
    val (n1, q1) = JsonlIngest.ingestDocuments(spark, src, out)
    assert(n1 == 1 && q1 == 2)
    // Policy fix: text is no longer required (placeholder docs allowed).
    // Re-parsing the quarantine recovers doc 41 into the landed parquet;
    // the genuinely broken line stays quarantined.
    val (recovered, still) = JsonlIngest.reingestQuarantine(spark, out,
      required = Seq("doc_id"))
    assert(recovered == 1 && still == 1, s"got ($recovered, $still)")
    val docs = spark.read.parquet(s"$out/documents.parquet")
    assert(docs.count() == 2, "recovered row must append to the landing")
    assert(docs.where("doc_id = 41").count() == 1)
    val qLines = spark.read.text(s"$out/quarantine").collect().map(_.getString(0))
    assert(qLines.length == 1 && qLines.head.contains("broken beyond repair"))
    // Second repair with the same policy: nothing left to recover, the
    // still-bad line persists — and an all-recovered quarantine deletes.
    val (r2, s2) = JsonlIngest.reingestQuarantine(spark, out, required = Seq("doc_id"))
    assert(r2 == 0 && s2 == 1)
    graft.queries.Det.releasePins(spark)
  }

  private def copyDir(from: java.nio.file.Path, to: java.nio.file.Path): Unit =
    java.nio.file.Files.walk(from).forEach { p =>
      val t = to.resolve(from.relativize(p).toString)
      if (java.nio.file.Files.isDirectory(p)) java.nio.file.Files.createDirectories(t)
      else java.nio.file.Files.copy(p, t,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }

  private def deleteDir(d: java.nio.file.Path): Unit =
    java.nio.file.Files.walk(d)
      .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
      .forEach(p => java.nio.file.Files.delete(p))

  test("quarantine repair is crash-idempotent: a replayed repair appends nothing") {
    // The crash window: recovered rows appended to the landing, then the
    // process dies BEFORE the quarantine tmp+rename swap — the recovered
    // lines are now in both places, and the operator re-runs the repair.
    // The anti-join against landed doc_ids must make the replay a no-op
    // on the landing (no duplicate keys), not a second append.
    val out = java.nio.file.Files.createTempDirectory("jsonl_crash_out").toString
    val src = stage(Seq(
      """{"doc_id": 60, "text": "kept row", "lang": "en", "source": "s0", "n_chars": 8}""",
      """{"doc_id": 61, "lang": "en", "source": "s0", "n_chars": 0}""", // missing text → quarantined
      """broken beyond repair {"""))
    val (n1, q1) = JsonlIngest.ingestDocuments(spark, src, out)
    assert(n1 == 1 && q1 == 2)
    val qDir = java.nio.file.Paths.get(s"$out/quarantine")
    val snap = java.nio.file.Files.createTempDirectory("jsonl_crash_snap")
    copyDir(qDir, snap)
    val (r1, s1) = JsonlIngest.reingestQuarantine(spark, out, required = Seq("doc_id"))
    assert(r1 == 1 && s1 == 1)
    // Simulate the crash: put the PRE-repair quarantine back (append
    // happened, swap "didn't"), then replay the repair.
    deleteDir(qDir)
    copyDir(snap, qDir)
    spark.catalog.refreshByPath(qDir.toString) // the test's restore, not the repair, changed the files
    val (r2, s2) = JsonlIngest.reingestQuarantine(spark, out, required = Seq("doc_id"))
    assert(r2 == 0 && s2 == 1,
      s"replayed repair must recover nothing new, got ($r2, $s2)")
    val docs = spark.read.parquet(s"$out/documents.parquet")
    assert(docs.count() == 2 && docs.where("doc_id = 61").count() == 1,
      "doc 61 must appear exactly once after the replay")
    graft.queries.Det.releasePins(spark)
  }

  test("repair invalidates pinned plans over the landing (recovered rows visible)") {
    // A session that read the landing BEFORE the repair holds a pinned
    // parse of it (plan-identical reads share the InMemoryRelation);
    // without the repair's refreshByPath on documents.parquet every
    // such plan keeps serving the pre-repair corpus and silently misses
    // the recovered rows.
    val out = java.nio.file.Files.createTempDirectory("jsonl_refresh_out").toString
    val src = stage(Seq(
      """{"doc_id": 70, "text": "kept row", "lang": "en", "source": "s0", "n_chars": 8}""",
      """{"doc_id": 71, "lang": "en", "source": "s0", "n_chars": 0}""")) // recoverable
    val (n1, q1) = JsonlIngest.ingestDocuments(spark, src, out)
    assert(n1 == 1 && q1 == 1)
    val landing = s"$out/documents.parquet"
    val pinned = graft.queries.Det.pin(spark.read.parquet(landing))
    assert(pinned.count() == 1)
    val (r1, s1) = JsonlIngest.reingestQuarantine(spark, out, required = Seq("doc_id"))
    assert(r1 == 1 && s1 == 0)
    assert(spark.read.parquet(landing).count() == 2,
      "a plan-identical read after the repair must see the recovered row")
    graft.queries.Det.releasePins(spark)
  }
}
