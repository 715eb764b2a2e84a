package graft

import org.apache.spark.sql.functions._
import graft.ext.BpeArtifact
import graft.queries.TextOps

/** The persisted BPE model: train-once/serve-forever semantics, artifact
  * ≡ in-session training, warm loads with zero training state, and
  * corpus-swap invalidation.
  */
class BpeArtifactSpec extends SparkSpec {

  /** A private COPY of the sf0.001 documents table: the default artifact
    * dir is keyed on the corpus path, so a copied corpus gives this
    * suite its own artifact location without touching the one the query
    * sweep shares.
    */
  private lazy val dir = {
    val d = java.nio.file.Files.createTempDirectory("bpe_art_corpus").toString
    Tables.documents(spark, "/root/testdata/sf0.001")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("ensure trains exactly once, then serves from disk") {
    val art = BpeArtifact.defaultDir(dir)
    assert(BpeArtifact.ensure(spark, dir, art),
      "first ensure on a cold environment must train")
    assert(!BpeArtifact.ensure(spark, dir, art),
      "second ensure must find the artifact current and NOT retrain")
    graft.queries.Det.releasePins(spark)
  }

  test("persisted rules are exactly the in-session training's rules") {
    val art = BpeArtifact.defaultDir(dir)
    BpeArtifact.ensure(spark, dir, art)
    val loaded2 = BpeArtifact.rules2(spark, art)
    val trained2 = TextOps.bpeTrainRules2(spark, dir)
    assert(loaded2 == trained2, s"rules2 drifted:\n$loaded2\nvs\n$trained2")
    assert(loaded2.size == 16)
    val loaded1 = BpeArtifact.rules1(spark, art)
      .orderBy(col("rank")).collect().map(r =>
        (r.getAs[Int]("rank"), r.getAs[String]("pat"), r.getAs[String]("rep"))).toSeq
    val derived1 = TextOps.bpeRules1Table(spark, dir)
      .orderBy(col("rank")).collect().map(r =>
        (r.getAs[Int]("rank"), r.getAs[String]("pat"), r.getAs[String]("rep"))).toSeq
    assert(loaded1 == derived1 && loaded1.size == 16)
    graft.queries.Det.releasePins(spark)
  }

  test("warm rules load runs zero training (no vocabulary memo appears)") {
    val art = BpeArtifact.defaultDir(dir)
    BpeArtifact.ensure(spark, dir, art)
    graft.queries.Det.releasePins(spark)
    assert(graft.queries.Det.registeredCount(spark) == 0)
    val rules = BpeArtifact.rules2(spark, art)
    assert(rules.size == 16)
    // Training would have pinned the pack.wcount memo; a pure model
    // read must not create ANY session training state.
    assert(graft.queries.Det.registeredCount(spark) == 0,
      "warm rules load created training state")
  }

  test("q_pack_bpe2 output is identical cold (train+save) vs warm (load)") {
    // Cold: wipe the artifact so the query trains and persists.
    val art = BpeArtifact.defaultDir(dir)
    def wipe(): Unit = {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      val d = new java.io.File(art)
      if (d.exists()) rm(d)
    }
    wipe()
    val cold = TextOps.queries("q_pack_bpe2")(spark, dir).collect()
    assert(BpeArtifact.isBuilt(art), "cold run must persist the artifact")
    graft.queries.Det.releasePins(spark)
    val warm = TextOps.queries("q_pack_bpe2")(spark, dir).collect()
    assert(cold.toSeq == warm.toSeq, "served rules changed the packing")
    graft.queries.Det.releasePins(spark)
  }

  test("a corpus swap under the same path invalidates the artifact") {
    val art = BpeArtifact.defaultDir(dir)
    BpeArtifact.ensure(spark, dir, art)
    // Shrink the corpus in place: the count check must catch it.
    val half = Tables.documents(spark, dir).filter(col("doc_id") % 2 === 0)
    val tmp = java.nio.file.Files.createTempDirectory("bpe_half").toString
    half.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    spark.read.parquet(s"$tmp/documents.parquet")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    assert(!BpeArtifact.isCurrent(spark, dir, art),
      "stale artifact served after a corpus swap")
    assert(BpeArtifact.ensure(spark, dir, art), "swap must retrain")
    graft.queries.Det.releasePins(spark)
  }
}
