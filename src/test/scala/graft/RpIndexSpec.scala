package graft

import org.apache.spark.sql.functions._
import graft.ext.RpIndex
import graft.queries.Similarity

/** Persisted RP projection: build-once → serve-from-disk bit-identical
  * to the in-session derivation, with NO projection work in the warm
  * plan, and count/path invalidation.
  */
class RpIndexSpec extends SparkSpec {

  private lazy val dir = {
    val d = java.nio.file.Files.createTempDirectory("rpidx_corpus").toString
    Tables.embeddings(spark, "/root/testdata/sf0.001")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  test("served projection equals the in-session derivation exactly") {
    val idx = RpIndex.defaultDir(dir)
    assert(RpIndex.ensure(spark, dir, idx), "first ensure must derive and save")
    assert(!RpIndex.ensure(spark, dir, idx), "second ensure must be a pure load")
    val served = RpIndex.proj(spark, idx)
      .orderBy("vec_id").collect().map(_.toSeq)
    val derived = Similarity.rpProjectInSession(spark, dir)
      .orderBy("vec_id").collect().map(_.toSeq)
    assert(served.toSeq == derived.toSeq,
      "persisted projected vectors must equal the in-session chain bit-for-bit")
    graft.queries.Det.releasePins(spark)
  }

  test("a fresh session serves the rerank query with zero projection work in the plan") {
    RpIndex.ensure(spark, dir, RpIndex.defaultDir(dir))
    val fresh = spark.newSession()
    val qe = Similarity.queries("q_knn_rp_rerank")(fresh, dir).queryExecution
    val opt = qe.optimizedPlan.toString
    assert(!opt.contains("md5(concat(cast(j"),
      "warm plan must not re-derive the projection matrix")
    assert(qe.executedPlan.toString.contains(RpIndex.defaultDir(dir)),
      "warm plan must scan the persisted projection dir")
    assert(Similarity.queries("q_knn_rp_rerank")(fresh, dir).collect().nonEmpty)
    graft.queries.Det.releasePins(fresh)
  }

  test("a corpus swap under the same path invalidates the projection") {
    val idx = java.nio.file.Files.createTempDirectory("rpidx2").toString
    assert(RpIndex.ensure(spark, dir, idx))
    val half = java.nio.file.Files.createTempDirectory("rpidx_half").toString
    Tables.embeddings(spark, dir).filter(col("vec_id") % 2 === 0)
      .write.mode("overwrite").parquet(s"$half/embeddings.parquet")
    assert(RpIndex.ensure(spark, half, idx),
      "count mismatch must force a re-derivation")
    graft.queries.Det.releasePins(spark)
  }

  test("a SAME-COUNT in-place corpus swap invalidates (content fingerprint)") {
    // The r12 demerit: count+path currency cannot detect a corpus
    // overwritten in place with the same row count. The fingerprint's
    // sampled content hash must.
    val d = java.nio.file.Files.createTempDirectory("rpidx_swapcorp").toString
    Tables.embeddings(spark, "/root/testdata/sf0.001")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    val idx = java.nio.file.Files.createTempDirectory("rpidx3").toString
    assert(RpIndex.ensure(spark, d, idx))
    assert(!RpIndex.ensure(spark, d, idx), "unchanged corpus must serve")
    // Same ids, same count, every component shifted — a regenerated
    // corpus landing under the same path.
    val tmp = java.nio.file.Files.createTempDirectory("rpidx_swaptmp").toString
    Tables.embeddings(spark, d)
      .withColumn("embedding", expr("transform(embedding, x -> x + CAST(1.0 AS FLOAT))"))
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    spark.read.parquet(s"$tmp/embeddings.parquet")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    // In-place mutation of a plain (un-versioned) dir: tell the session
    // memo (the REFRESH TABLE analogue); the FINGERPRINT then detects.
    graft.ext.Currency.invalidate(d)
    assert(RpIndex.ensure(spark, d, idx),
      "same-count swap must re-derive — count+path currency could never catch this")
    graft.queries.Det.releasePins(spark)
  }

  test("appendVecs commits O(increment) growth that equals a full rebuild bit-for-bit") {
    val all = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val dirA = java.nio.file.Files.createTempDirectory("rpidx_half_a").toString
    all.filter(col("vec_id") % 2 === 0)
      .write.mode("overwrite").parquet(s"$dirA/embeddings.parquet")
    val idx = java.nio.file.Files.createTempDirectory("rpidx_append").toString
    RpIndex.build(spark, dirA, idx)
    val v1 = graft.ext.Versioned.currentVersion(idx)
    RpIndex.appendVecs(spark, idx, all.filter(col("vec_id") % 2 === 1))
    assert(graft.ext.Versioned.currentVersion(idx) == v1 + 1,
      "append must commit as a new version, never mutate the live table")
    // Full rebuild over the union — the appended artifact must equal it
    // exactly (per-vector projection + order-free decimal sums).
    val dirB = java.nio.file.Files.createTempDirectory("rpidx_full_b").toString
    all.write.mode("overwrite").parquet(s"$dirB/embeddings.parquet")
    val idx2 = java.nio.file.Files.createTempDirectory("rpidx_full").toString
    RpIndex.build(spark, dirB, idx2)
    val appended = RpIndex.proj(spark, idx).collect().map(_.toSeq).toSet
    val rebuilt = RpIndex.proj(spark, idx2).collect().map(_.toSeq).toSet
    assert(appended == rebuilt, "append ≡ rebuild must hold bit-for-bit")
    // The incrementally-merged fingerprint equals the union corpus's
    // (count adds, max maxes, sample-hash sums) — old vectors unread.
    val fpMerged = spark.read
      .parquet(s"${graft.ext.Versioned.committedDir(idx)}/meta")
      .head().getAs[String]("fingerprint")
    assert(fpMerged == graft.ext.Currency.vecsFp(spark, dirB).repr,
      "mergeable fingerprint must equal the union corpus's fingerprint")
    graft.queries.Det.releasePins(spark)
  }

  test("a replayed increment is REFUSED (disjointness gate) — append ≡ rebuild stays protected") {
    val all = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val dirA = java.nio.file.Files.createTempDirectory("rpidx_gate_a").toString
    all.filter(col("vec_id") % 2 === 0)
      .write.mode("overwrite").parquet(s"$dirA/embeddings.parquet")
    val idx = java.nio.file.Files.createTempDirectory("rpidx_gate").toString
    RpIndex.build(spark, dirA, idx)
    val odds = all.filter(col("vec_id") % 2 === 1)
    RpIndex.appendVecs(spark, idx, odds)
    val v2 = graft.ext.Versioned.currentVersion(idx)
    // The at-least-once failure: the same increment delivered again.
    intercept[graft.ext.Gate.OverlappingAppendException] {
      RpIndex.appendVecs(spark, idx, odds)
    }
    assert(graft.ext.Versioned.currentVersion(idx) == v2,
      "a refused append must not commit")
    assert(RpIndex.proj(spark, idx).count() == all.count(),
      "a refused append must not double-project any vector")
    // An internally-duplicated increment is refused too.
    intercept[graft.ext.Gate.OverlappingAppendException] {
      RpIndex.appendVecs(spark, idx, odds.limit(1).union(odds.limit(1)))
    }
    graft.queries.Det.releasePins(spark)
  }

  test("segment blooms prove a non-monotone disjoint append WITHOUT reading the committed table") {
    // r14 VERDICT #2: the postings gate's bloom rung, extended here — an
    // id-reusing-but-disjoint feed admits in O(increment); the committed
    // proj table is read only for bloom candidates (exact-rung counter).
    val all = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val dirA = java.nio.file.Files.createTempDirectory("rpidx_bloom_a").toString
    all.filter(col("vec_id") % 2 === 0)
      .write.mode("overwrite").parquet(s"$dirA/embeddings.parquet")
    val idx = java.nio.file.Files.createTempDirectory("rpidx_bloom").toString
    RpIndex.build(spark, dirA, idx)
    assert(RpIndex.blooms(idx).nonEmpty, "a build must land a bloom over its vec_ids")
    // Direct thunk-throws pin on the gate with THIS artifact's blooms:
    // odd ids are below the committed max (non-monotone) yet disjoint.
    val evensMax = all.filter(col("vec_id") % 2 === 0)
      .agg(max(col("vec_id"))).head().getLong(0)
    graft.ext.Gate.requireDisjoint(
      all.filter(col("vec_id") % 2 === 1).select("vec_id"), "vec_id", evensMax,
      { fail("the committed proj table must not be read when blooms prove disjointness") },
      "rp-projection", RpIndex.blooms(idx))
    // The real append takes the same rung: exact-rung counter unchanged.
    val before = graft.ext.Gate.exactRungRuns.get()
    RpIndex.appendVecs(spark, idx, all.filter(col("vec_id") % 2 === 1))
    assert(graft.ext.Gate.exactRungRuns.get() == before,
      "a bloom-proven disjoint append must never run the exact semi-join rung")
    // Replay lands in the blooms → exact rung runs → refused.
    intercept[graft.ext.Gate.OverlappingAppendException] {
      RpIndex.appendVecs(spark, idx, all.filter(col("vec_id") % 2 === 1))
    }
    assert(graft.ext.Gate.exactRungRuns.get() == before + 1,
      "a replayed increment is a bloom candidate — the exact rung must decide it")
    // Coverage survives the append: parent segment carried + increment's own.
    assert(RpIndex.blooms(idx).size == 2,
      "append must carry the parent bloom forward and land its own segment")
    graft.queries.Det.releasePins(spark)
  }
}
