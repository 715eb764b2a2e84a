package graft

import org.apache.spark.sql.functions._
import graft.ext.CorpusRun

/** The one-command chain: gz-JSONL dump → ingest (corrupt line
  * quarantined) → full cleaning pipeline (planted quality / contamination
  * / exact / near dups each dropped at their own stage) → split-keyed
  * final corpus (md5-stable assignment) + lineage.
  */
class CorpusRunSpec extends SparkSpec {

  private def freshText(tag: String): String =
    (0 until 40).map(i => s"${tag}w$i").mkString(" ")

  private def jline(id: Long, text: String): String =
    s"""{"doc_id": $id, "text": "$text", "lang": "en", "source": "s0", "n_chars": ${text.length}}"""

  private def jlineU(id: Long, text: String, url: String): String =
    s"""{"doc_id": $id, "text": "$text", "lang": "en", "source": "s0", "n_chars": ${text.length}, "url": "$url"}"""

  test("full chain from a dirty gz dump: stage counts exact, split stable, lineage recorded") {
    import spark.implicits._
    val benchText = freshText("bm")
    val nearBase = freshText("nd")
    val nearTwin = nearBase.split(" ").dropRight(1).mkString(" ") + " ndCHANGED"
    val lines =
      (0 until 30).map(i => jline(i.toLong, freshText(s"doc$i"))) ++ Seq(
        jline(100L, freshText("dup")),            // exact pair: 101 drops
        jline(101L, freshText("dup")),
        jline(110L, nearBase),                    // near pair: 111 drops
        jline(111L, nearTwin),
        jline(120L, "the a of and to in the a of"), // fails the quality score
        jline(130L, benchText),                   // verbatim benchmark: contam drop
        jlineU(140L, freshText("ua"),             // url pair: DISTINCT texts,
          "https://example.com/p/1"),             // same canonical url —
        jlineU(141L, freshText("ub"),             // 141 drops at the URL stage
          "https://WWW.Example.com/p/1/?utm_source=x"),
        """{"broken json line""")                 // quarantined at ingest
    val srcDir = java.nio.file.Files.createTempDirectory("corpusrun_src")
    val gz = new java.util.zip.GZIPOutputStream(
      java.nio.file.Files.newOutputStream(srcDir.resolve("dump.jsonl.gz")))
    try gz.write(lines.mkString("\n").getBytes("UTF-8")) finally gz.close()

    val benchDir = java.nio.file.Files.createTempDirectory("corpusrun_bench").toString
    Seq((9000L, benchText, "en", "bench", benchText.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$benchDir/documents.parquet")

    val out = java.nio.file.Files.createTempDirectory("corpusrun_out").toString
    val r = CorpusRun.run(spark, srcDir.resolve("dump.jsonl.gz").toString, out,
      benchmarkDir = Some(benchDir))

    // Every planted defect drops at exactly its own stage.
    assert(r.ingested == 38 && r.quarantined == 1, s"got $r")
    assert(r.stages.input == 38)
    assert(r.stages.afterQuality == 37, "the stopword-soup doc fails the score")
    assert(r.stages.afterContam == 36, "the verbatim benchmark doc drops")
    assert(r.stages.afterUrl == 35, "one canonical-url twin drops")
    assert(r.stages.afterExact == 34, "one exact twin drops")
    assert(r.stages.afterNear == 33, "one near twin drops")
    assert(r.stages.afterSemantic == 33, "no embeddings: pass-through")
    assert(r.stages.sequences > 0)
    assert(r.trainDocs + r.valDocs + r.testDocs == 33)

    // Survivors are exactly the corpus minus the five planted losers.
    val finalDf = spark.read.parquet(s"$out/corpus_final")
    val ids = finalDf.select("doc_id").as[Long].collect().toSet
    val expected = (0 until 30).map(_.toLong).toSet ++ Set(100L, 110L, 140L)
    assert(ids == expected, s"got $ids")

    // The URL drop is auditable with its canonical key + keeper.
    val urlDropped = spark.read.parquet(s"$out/pipeline/url_dropped").collect()
    assert(urlDropped.map(_.getAs[Long]("doc_id")).toSeq == Seq(141L))
    assert(urlDropped.head.getAs[Long]("keeper_doc") == 140L)
    assert(urlDropped.head.getAs[String]("canon_url") == "https://example.com/p/1")

    // Split-stable ids: the on-disk partition equals the md5 rule
    // recomputed here — the q_split_assign contract on the shipped data.
    def expectedSplit(id: Long): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val bucket = Integer.parseInt(hex.substring(0, 2), 16)
      if (bucket < 230) "train" else if (bucket < 243) "val" else "test"
    }
    val splits = finalDf.select("doc_id", "split").as[(Long, String)].collect()
    assert(splits.forall { case (id, s) => s == expectedSplit(id) },
      "on-disk split partition diverged from the md5 assignment rule")

    // Lineage: the registry holds the whole chain, and the DOT exists.
    val lineage = spark.read.parquet(s"$out/lineage").collect()
    assert(lineage.length == 4, s"expected 4 lineage edges, got ${lineage.length}")
    assert(lineage.forall(_.getAs[String]("job_id") == "corpus_run"))
    val dot = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$out/lineage.dot")), "UTF-8")
    assert(dot.contains("digraph") && dot.contains("corpus_final"))

    // The contamination drop is auditable with its ratio.
    val contam = spark.read.parquet(s"$out/pipeline/contaminated").collect()
    assert(contam.map(_.getAs[Long]("doc_id")).toSeq == Seq(130L))
    graft.queries.Det.releasePins(spark)
  }
}
