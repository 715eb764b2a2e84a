package graft

import graft.ext.{AnnIndex, BpeArtifact, IndexRun, PostingsIndex}

/** The one-command index lifecycle: a cold corpus builds everything, a
  * second pass over the unchanged corpus provably does NOTHING (every
  * maintenance decision a no-op), and the report says so.
  */
class IndexRunSpec extends SparkSpec {

  /** Private corpus copy: artifact dirs are keyed on the corpus path,
    * so this suite never races the shared-sweep artifacts.
    */
  private lazy val dir = {
    val d = java.nio.file.Files.createTempDirectory("indexrun_corpus").toString
    Tables.documents(spark, "/root/testdata/sf0.001")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    Tables.embeddings(spark, "/root/testdata/sf0.001")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  test("cold run builds all three artifacts; warm run is a pure no-op") {
    val r1 = IndexRun.run(spark, dir)
    assert(r1.annBuilt && r1.postingsBuilt && r1.rpBuilt && r1.bpeTrained,
      s"cold run must build everything: $r1")
    assert(r1.annAction == "noop",
      s"a freshly built index has nothing to maintain: $r1")
    assert(r1.bpeAction == "noop" && r1.bpeOverlap == 1.0,
      s"a freshly trained model cannot have drifted from itself: $r1")
    assert(AnnIndex.isBuilt(AnnIndex.defaultIndexDir(dir)))
    assert(PostingsIndex.isBuilt(PostingsIndex.defaultDir(dir)))
    assert(BpeArtifact.isBuilt(BpeArtifact.defaultDir(dir)))
    val r2 = IndexRun.run(spark, dir)
    assert(!r2.annBuilt && !r2.postingsBuilt && !r2.rpBuilt && !r2.bpeTrained,
      s"warm run must not rebuild anything: $r2")
    assert(r2.annAction == "noop" && r2.bpeAction == "noop",
      s"warm run must decide no-op everywhere: $r2")
    graft.queries.Det.releasePins(spark)
  }

  test("fleet status reports every artifact's committed version, footprint and corpus pin") {
    IndexRun.run(spark, dir) // idempotent warm pass — artifacts exist
    val st = IndexRun.status(spark, dir)
    assert(st.map(_.kind).sorted == Seq("ann", "bpe", "postings", "rp"))
    for (a <- st) {
      assert(a.version >= 1, s"${a.kind} must be committed: $a")
      assert(a.retained.contains(a.version), s"${a.kind} retained window: $a")
      assert(a.files > 0 && a.bytes > 0, s"${a.kind} footprint: $a")
      assert(a.corpusDir == dir, s"${a.kind} must pin the corpus path: $a")
      assert(a.fingerprint.nonEmpty,
        s"${a.kind} must pin the corpus content fingerprint: $a")
    }
    graft.queries.Det.releasePins(spark)
  }
}
