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
}
