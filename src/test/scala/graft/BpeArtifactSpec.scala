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

  test("vocab drift triggers a versioned retrain; the pinned version serves until the swap") {
    import spark.implicits._
    // Independent corpus copy: the suite's shared `dir` is mutated by the
    // swap test, and wordCounts memoizes per-dir.
    val cA = java.nio.file.Files.createTempDirectory("bpe_drift_a").toString
    Tables.documents(spark, "/root/testdata/sf0.001")
      .write.mode("overwrite").parquet(s"$cA/documents.parquet")
    val art = BpeArtifact.defaultDir(cA)
    BpeArtifact.ensure(spark, cA, art)
    val v1 = BpeArtifact.currentVersion(art)
    assert(v1 > 0)
    // Un-drifted: the same corpus's live top-16 merges ARE the model's.
    val r0 = BpeArtifact.retrainIfDrifted(spark, cA, art)
    assert(r0.action == "noop" && r0.overlap == 1.0 && r0.version == v1, s"got $r0")
    assert(BpeArtifact.currentVersion(art) == v1, "a no-op must not bump the version")
    // Drifted corpus: a disjoint vocabulary (every char pair novel).
    val cB = java.nio.file.Files.createTempDirectory("bpe_drift_b").toString
    (0L until 50L).map(i => (i, s"zq$i xv$i qj$i zx$i vq$i jx$i", "en", "s0", 30L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$cB/documents.parquet")
    val rulesPinned = BpeArtifact.rules2(spark, art)
    val r1 = BpeArtifact.retrainIfDrifted(spark, cB, art)
    assert(r1.action == "retrained", s"disjoint vocab must retrain, got $r1")
    assert(r1.overlap < 0.75, s"overlap must be below the bound, got ${r1.overlap}")
    assert(BpeArtifact.currentVersion(art) == v1 + 1, "retrain must commit a NEW version")
    assert(BpeArtifact.rules2(spark, art) != rulesPinned,
      "the committed model must be the retrained one")
    // The superseded version dir survives the swap (readers with lazy
    // plans against it stay valid until the NEXT promote).
    assert(new java.io.File(s"$art/v$v1/rules2").exists(),
      "the previous committed version must be retained after the swap")
    // Both decisions audited.
    val audit = spark.read.parquet(s"$art/audit")
      .orderBy(col("decided_at_ms")).collect().map(_.getAs[String]("action")).toSeq
    assert(audit == Seq("noop", "retrained"), s"audit trail: $audit")
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
    // In-place mutation of a plain (un-versioned) corpus dir: the session
    // currency memo must be told, like Spark's own REFRESH TABLE for its
    // file-listing caches; the FINGERPRINT then does the detecting.
    graft.ext.Currency.invalidate(dir)
    assert(!BpeArtifact.isCurrent(spark, dir, art),
      "stale artifact served after a corpus swap")
    assert(BpeArtifact.ensure(spark, dir, art), "swap must retrain")
    graft.queries.Det.releasePins(spark)
  }
}
