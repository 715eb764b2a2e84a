package graft

import org.apache.spark.sql.functions._
import graft.ext.{AnnIndex, BpeArtifact, PostingsIndex, Publish, RpIndex}

/** The full publish chain: dirty JSONL dump → cleaned serving corpus +
  * every index artifact current, in one call; a re-publish of the
  * unchanged dump leaves every artifact provably untouched.
  */
class PublishSpec extends SparkSpec {
  import spark.implicits._

  private def freshText(tag: String): String =
    (0 until 40).map(i => s"${tag}w$i").mkString(" ")

  private def jline(id: Long, text: String): String =
    s"""{"doc_id": $id, "text": "$text", "lang": "en", "source": "s${id % 2}", "n_chars": ${text.length}}"""

  test("publish lands serving corpus + all artifacts; re-publish no-ops the index phase") {
    // 8 clean docs + one exact-dup (drops) + one broken line (quarantine).
    val lines = (0L until 8L).map(i => jline(i, freshText(s"p$i"))) ++
      Seq(jline(20L, freshText("p0")), """{"broken""")
    val src = java.nio.file.Files.createTempDirectory("publish_src")
    java.nio.file.Files.write(src.resolve("dump.jsonl"),
      lines.mkString("\n").getBytes("UTF-8"))
    // Embeddings for every ingested doc (64-dim blobs keyed by doc_id);
    // the publish must restrict them to the SURVIVORS.
    val emb = (0L until 8L).union(Seq(20L)).toSeq.map { id =>
      (id, Array.tabulate(64)(i => ((id * 7 + i) % 13 - 6).toFloat))
    }.toDF("doc_id", "embedding")

    val out = java.nio.file.Files.createTempDirectory("publish_out").toString
    val r = Publish.run(spark, src.resolve("dump.jsonl").toString, out,
      embeddings = Some(emb))
    assert(r.run.ingested == 9 && r.run.quarantined == 1, s"got $r")
    assert(r.servingDocs == 8, s"one exact dup drops: $r")
    assert(r.servingVecs == 8, s"embeddings restricted to survivors: $r")
    assert(r.index.annBuilt && r.index.postingsBuilt && r.index.rpBuilt
      && r.index.bpeTrained, s"cold publish must build every artifact: $r")
    assert(r.index.annAction == "noop" && r.index.bpeAction == "noop")
    val servingDir = s"$out/serving"
    assert(AnnIndex.isBuilt(AnnIndex.defaultIndexDir(servingDir)))
    assert(PostingsIndex.isBuilt(PostingsIndex.defaultDir(servingDir)))
    assert(RpIndex.isBuilt(RpIndex.defaultDir(servingDir)))
    assert(BpeArtifact.isBuilt(BpeArtifact.defaultDir(servingDir)))
    // The published serving corpus IS a queryable corpus dir.
    assert(graft.queries.TextOps.queries("q_phrase_search")(spark, servingDir)
      .collect() != null)

    // Re-publish the identical dump: pipeline re-runs, index phase no-ops.
    val r2 = Publish.run(spark, src.resolve("dump.jsonl").toString, out,
      embeddings = Some(emb))
    assert(!r2.index.annBuilt && !r2.index.postingsBuilt && !r2.index.rpBuilt
      && !r2.index.bpeTrained, s"re-publish must not rebuild: $r2")
    assert(r2.index.annAction == "noop" && r2.index.bpeAction == "noop")
    graft.queries.Det.releasePins(spark)
  }

  test("a text-only publish skips the vector artifacts and still serves postings/BPE") {
    val lines = (0L until 6L).map(i => jline(100 + i, freshText(s"t$i")))
    val src = java.nio.file.Files.createTempDirectory("publish_src2")
    java.nio.file.Files.write(src.resolve("dump.jsonl"),
      lines.mkString("\n").getBytes("UTF-8"))
    val out = java.nio.file.Files.createTempDirectory("publish_out2").toString
    val r = Publish.run(spark, src.resolve("dump.jsonl").toString, out)
    assert(r.servingVecs == 0 && !r.index.annBuilt && !r.index.rpBuilt)
    assert(r.index.annAction == "skipped", s"got $r")
    assert(r.index.postingsBuilt && r.index.bpeTrained)
    graft.queries.Det.releasePins(spark)
  }
}
