package graft

import org.apache.spark.sql.functions._

/** Corpus-level source overlap (exact + MinHash signature) and
  * repeated-passage trimming — planted-fixture checks of the semantics
  * the DuckDB oracles pin cell-exactly at sf0.01.
  */
class SourceOverlapSpec extends SparkSpec {
  import spark.implicits._

  private def stage(rows: Seq[(Long, String, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("srcov").toString
    rows.map { case (id, t, src) => (id, t, "en", src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("exact source overlap computes pairwise shingle Jaccard; disjoint pairs absent") {
    // s0 = {a b c, b c d}, s1 = {a b c, b c e} -> inter 1, union 3.
    // s2 = {x y z} -> disjoint from both. s3 duplicates s0's set exactly.
    val dir = stage(Seq(
      (1L, "a b c d", "s0"),
      (2L, "a b c e", "s1"),
      (3L, "x y z", "s2"),
      (4L, "a b c d", "s3")))
    val rows = queries.Dedup.sourceOverlap(spark, dir).collect()
      .map(r => (r.getAs[String]("source_a"), r.getAs[String]("source_b")) ->
        (r.getAs[Long]("inter"), r.getAs[Double]("jaccard"))).toMap
    assert(rows.keySet == Set(("s0", "s1"), ("s0", "s3"), ("s1", "s3")),
      s"zero-overlap pairs must be absent: ${rows.keySet}")
    assert(rows(("s0", "s1")) == (1L, 0.333333))
    assert(rows(("s0", "s3")) == (2L, 1.0))
    assert(rows(("s1", "s3")) == (1L, 0.333333))
    queries.Det.releasePins(spark)
  }

  test("signature overlap: identical sets give 12/12 matches; all pairs present") {
    val dir = stage(Seq(
      (1L, "a b c d", "s0"),
      (2L, "a b c e", "s1"),
      (3L, "x y z", "s2"),
      (4L, "a b c d", "s3")))
    val rows = queries.Dedup.sourceOverlapSig(spark, dir).collect()
      .map(r => (r.getAs[String]("source_a"), r.getAs[String]("source_b")) ->
        (r.getAs[Long]("sig_matches"), r.getAs[Double]("est_jaccard"))).toMap
    // The signature join keeps every pair — including zero-overlap ones.
    assert(rows.keySet == Set(
      ("s0", "s1"), ("s0", "s2"), ("s0", "s3"),
      ("s1", "s2"), ("s1", "s3"), ("s2", "s3")))
    assert(rows(("s0", "s3")) == (12L, 1.0), "identical shingle sets share every minimum")
    assert(rows(("s0", "s2"))._1 == 0L && rows(("s1", "s2"))._1 == 0L,
      "disjoint md5 minima should not collide")
    // Estimate is bounded and consistent with the exact 1/3 within the
    // resolution of 12 coordinates (binomial, not asserted to a point).
    val m01 = rows(("s0", "s1"))._1
    assert(m01 >= 1L && m01 <= 11L, s"J=1/3 over 12 coords, got $m01")
    queries.Det.releasePins(spark)
  }

  test("passage trim removes cross-doc boilerplate spans, keeps unique tokens in order") {
    val dir = stage(Seq(
      (1L, "u1 u2 u3 b1 b2 b3 b4 b5 u4 u5", "s0"),
      (2L, "v1 v2 b1 b2 b3 b4 b5 v3 v4 v5", "s0"),
      (3L, "w1 w2", "s0"),          // shorter than one shingle: untouched
      (4L, "x1 x2 x3 x4", "s0"),    // exact pair with doc 5: fully trimmed
      (5L, "x1 x2 x3 x4", "s0")))
    val rows = queries.Dedup.dedupPassage(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_toks"), r.getAs[Long]("n_dup_toks"),
          r.getAs[String]("trimmed_text"), r.getAs[Double]("dup_ratio"))).toMap
    assert(rows(1L) == (10L, 5L, "u1 u2 u3 u4 u5", 0.5))
    assert(rows(2L) == (10L, 5L, "v1 v2 v3 v4 v5", 0.5))
    assert(rows(3L) == (2L, 0L, "w1 w2", 0.0))
    assert(rows(4L) == (4L, 4L, "", 1.0))
    assert(rows(5L) == (4L, 4L, "", 1.0))
  }
}
