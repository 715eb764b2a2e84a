package graft

import graft.queries.{Dedup, Det, Similarity}

/** Pin lifecycle: every Det.pin / Det.memo cache entry must be released by
  * Det.releasePins — a long-lived session running the full query sweep must
  * not accumulate dead InMemoryRelations (cache-eviction churn at scale).
  */
class PinLifecycleSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("releasePins drops every retained InMemoryRelation and memo entry") {
    Det.releasePins(spark) // isolate from pins left by other suites
    val cm = spark.sharedState.cacheManager
    assert(cm.isEmpty, "precondition: no cached relations before the sweep")

    // Pin-heavy queries: shared shingle memo + per-query signature pins,
    // shared norm/sketch memos.
    Dedup.queries("q_dedup_minhash")(spark, sfDir).count()
    Similarity.queries("q_knn_lsh")(spark, sfDir).count()
    assert(!cm.isEmpty, "the sweep should have pinned intermediates")

    Det.releasePins(spark)
    assert(cm.isEmpty, "releasePins must drop every pinned relation")
  }

  test("pins rebuild (not silently uncached) after release") {
    Det.releasePins(spark)
    val cm = spark.sharedState.cacheManager
    // Re-running after release must re-pin — a memo entry surviving the
    // release would serve an unpersisted DataFrame and recompute its HOF
    // chain once per consumer.
    Dedup.queries("q_dedup_simhash")(spark, sfDir).count()
    assert(!cm.isEmpty, "memoized pins must re-register after release")
    Det.releasePins(spark)
    assert(cm.isEmpty)
  }
}
