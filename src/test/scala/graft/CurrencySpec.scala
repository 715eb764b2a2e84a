package graft

import org.apache.spark.sql.functions._
import graft.ext.{Currency, PostingsIndex, Versioned}

/** The artifact-currency memo contract (r12 VERDICT #4 / demerit #2):
  * the second serve in a session runs ZERO currency jobs; the memo
  * self-invalidates on a committed-version bump of either side; stale
  * verdicts are never cached.
  */
class CurrencySpec extends SparkSpec {
  import spark.implicits._

  private def uniq(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  test("positive verdicts are memoized; negative verdicts never are") {
    val (c, a) = (uniq("cur_c"), uniq("cur_a"))
    val before = Currency.computeRuns.get()
    assert(!Currency.cached("t", c, a) { false })
    assert(!Currency.cached("t", c, a) { false })
    assert(Currency.computeRuns.get() == before + 2,
      "a stale verdict must be recomputed after the rebuild it triggers")
    assert(Currency.cached("t", c, a) { true })
    assert(Currency.cached("t", c, a) { sys.error("memo hit must not recompute") })
    assert(Currency.computeRuns.get() == before + 3)
  }

  test("a committed-version bump on either side self-invalidates the memo") {
    val (c, a) = (uniq("cur_c2"), uniq("cur_a2"))
    val before = Currency.computeRuns.get()
    assert(Currency.cached("t2", c, a) { true })
    assert(Currency.cached("t2", c, a) { true })
    assert(Currency.computeRuns.get() == before + 1, "repeat serve must memo-hit")
    // The artifact rebuilds/appends (its CURRENT flips) → recompute.
    Versioned.promote(a, 1)
    assert(Currency.cached("t2", c, a) { true })
    assert(Currency.computeRuns.get() == before + 2,
      "an artifact version bump must drop the cached verdict")
    // The corpus snapshot flips (a Publish) → recompute.
    Versioned.promote(c, 1)
    assert(Currency.cached("t2", c, a) { true })
    assert(Currency.computeRuns.get() == before + 3,
      "a corpus snapshot flip must drop the cached verdict")
  }

  test("invalidate drops only the named corpus's verdicts") {
    val (c1, c2, a) = (uniq("cur_c3"), uniq("cur_c4"), uniq("cur_a3"))
    assert(Currency.cached("t3", c1, a) { true })
    assert(Currency.cached("t3", c2, a) { true })
    Currency.invalidate(c1)
    val before = Currency.computeRuns.get()
    assert(Currency.cached("t3", c2, a) { true })
    assert(Currency.computeRuns.get() == before, "other corpora keep their verdicts")
    assert(Currency.cached("t3", c1, a) { true })
    assert(Currency.computeRuns.get() == before + 1, "the named corpus recomputes")
  }

  test("second serve of a persisted index runs zero currency work (the memo in situ)") {
    val corpus = uniq("cur_corpus")
    Seq((0L, "alpha beta gamma delta", "en", "s0", 22L),
        (1L, "beta gamma epsilon zeta", "en", "s0", 23L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$corpus/documents.parquet")
    val idx = uniq("cur_idx")
    assert(PostingsIndex.ensure(spark, corpus, idx), "cold ensure builds")
    val afterBuild = Currency.computeRuns.get()
    assert(!PostingsIndex.ensure(spark, corpus, idx), "warm ensure serves")
    assert(Currency.computeRuns.get() == afterBuild + 1,
      "the FIRST warm serve proves currency once (one fingerprint job)")
    val afterFirst = Currency.computeRuns.get()
    assert(!PostingsIndex.ensure(spark, corpus, idx))
    assert(!PostingsIndex.ensure(spark, corpus, idx))
    assert(Currency.computeRuns.get() == afterFirst,
      "repeat serves must run ZERO currency jobs — the r12 per-run corpus count is gone")
  }
}
