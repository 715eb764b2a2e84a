package graft

import org.apache.spark.sql.functions._

/** Planted-fixture semantics for the edit-distance near-dup join and the
  * snapshot diff: blocking recall/precision, the quadratic-block cap, and
  * the added/removed/changed/unchanged classification.
  */
class FuzzySnapshotSpec extends SparkSpec {
  import spark.implicits._

  private def stage(rows: Seq[(Long, String, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("fuzzy").toString
    rows.map { case (id, t, src) => (id, t, "en", src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("fuzzy join finds the planted typo pair, skips unrelated and far texts") {
    // 1↔2: one character substitution (edit distance 1) under a shared
    // 12-char prefix. 3 shares the prefix but diverges by far more than
    // d=8. 4 is a different prefix entirely — never a candidate.
    val dir = stage(Seq(
      (1L, "shared head body alpha beta gamma delta", "s0"),
      (2L, "shared head body alpha beta gamma felta", "s0"),
      (3L, "shared head completely different tail of much greater length entirely", "s0"),
      (4L, "other prefix body alpha beta gamma delta", "s0")))
    val rows = queries.Dedup.dedupFuzzy(spark, dir).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[Long]("doc_a") == 1L && r.getAs[Long]("doc_b") == 2L)
    assert(r.getAs[Long]("edit_dist") == 1L)
    assert(r.getAs[Double]("sim") > 0.9)
  }

  test("capped containment finds the planted quote; equals the exact detector when no shingle is hot") {
    // A short doc wholly embedded in a long one: containment ≈ 1 while
    // Jaccard sits far below 0.8 (the jaccard_missed class). With every
    // shingle's df under the cap, the capped variant's candidate set is
    // complete and its output must equal the exact detector's.
    val quote = "the five boxing wizards jump quickly over rivers"
    val dir = stage(Seq(
      (1L, s"long article opening words here $quote closing remarks trail on and on", "s0"),
      (2L, quote, "s0"),
      (3L, "entirely unrelated text about something else altogether now", "s0")))
    val exact = queries.Dedup.dedupContainment(spark, dir).collect().map(_.toSeq).toSeq
    val capped = queries.Dedup.dedupContainmentCapped(spark, dir).collect().map(_.toSeq).toSeq
    assert(capped == exact,
      "with no shingle over the cap, capped containment must equal the exact detector")
    assert(capped.size == 1 && capped.head(2) == 2L,
      s"the quote doc must be reported as the contained side, got $capped")
    assert(capped.head(6) == true,
      "the planted pair must carry jaccard_missed = true (the class Jaccard-only pipelines ship)")
    queries.Det.releasePins(spark)
  }

  test("edit distance counts substitutions exactly (levenshtein parity fixture)") {
    val dir = stage(Seq(
      (1L, "aaaaaaaaaaaaXXXX", "s0"),
      (2L, "aaaaaaaaaaaaYYYY", "s0")))
    val rows = queries.Dedup.dedupFuzzy(spark, dir).collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[Long]("edit_dist") == 4L)
  }

  test("a boilerplate-prefix block above the cap is dropped whole, not exploded") {
    // 70 docs share one 12-char prefix and are pairwise near-identical:
    // an uncapped join would emit 70·69/2 pairs; the cap drops the block.
    val big = (1 to 70).map(i => (i.toLong, f"same prefix here tail$i%04d", "s0"))
    val dir = stage(big)
    assert(queries.Dedup.dedupFuzzy(spark, dir).count() == 0L)
  }

  test("snapshot diff classifies every doc_id into the right class with exact counts") {
    // ids 0..19 under the split rules: old = id%10<8, new = id%10≥2,
    // edited-in-new = id%7==0. added {8,9,18,19}; removed {0,1,10,11};
    // changed = both ∩ %7==0 = {7,14}; unchanged = the remaining 10.
    val docs = (0L to 19L).map(i => (i, s"text body $i", "s0"))
    val dir = stage(docs)
    val byClass = queries.Dedup.snapshotDiff(spark, dir).collect()
      .map(r => r.getAs[String]("class") -> r.getAs[Long]("n")).toMap
    assert(byClass == Map(
      "added" -> 4L, "removed" -> 4L, "changed" -> 2L, "unchanged" -> 10L))
  }

  test("snapshot diff counts split by source") {
    val docs = Seq((0L, "a", "s0"), (5L, "b", "s1"), (8L, "c", "s1"))
    // 0 → removed(s0); 5 → unchanged(s1); 8 → added(s1).
    val dir = stage(docs)
    val rows = queries.Dedup.snapshotDiff(spark, dir).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[String]("class"), r.getAs[Long]("n")))
    assert(rows.toSet == Set(("s0", "removed", 1L), ("s1", "unchanged", 1L), ("s1", "added", 1L)))
  }

  test("phrase search finds exact consecutive matches only, with occurrence counts") {
    // "x y z" has df=2 (docs 1,2) — every other trigram df=1. Doc 2
    // contains it twice; doc 3 has the tokens REVERSED (no match); doc 4
    // has x..z non-adjacent (no match).
    val dir = stage(Seq(
      (1L, "p q x y z r", "s0"),
      (2L, "x y z w x y z", "s0"),
      (3L, "z y x m n o", "s0"),
      (4L, "x q y q z q", "s0")))
    val rows = queries.TextOps.phraseSearch(spark, dir).collect()
    assert(rows.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L, 2L))
    rows.foreach { r =>
      assert(r.getAs[String]("phrase") == "x y z")
      assert(r.getAs[Long]("df") == 2L)
    }
    val byId = rows.map(r => r.getAs[Long]("doc_id") ->
      (r.getAs[Long]("n_occ"), r.getAs[Long]("first_pos"))).toMap
    assert(byId(1L) == (1L, 2L))
    assert(byId(2L) == (2L, 0L))
  }
}
