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
}
