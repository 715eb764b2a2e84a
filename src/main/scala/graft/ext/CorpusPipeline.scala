package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end training-corpus cleaning pipeline — the extension operators
  * (TextOps quality gate, exact + MinHash dedup) composed the way a real
  * 100 TB ingest would run them, cheapest-first so each stage shrinks the
  * data the next one sees:
  *
  *   0. PII scrub     — per-row regexp map (TextOps.scrubPii), before
  *                      any hash/shingle derivation can embed PII;
  *   1. quality gate  — per-row map, no shuffle, drops low-quality docs;
  *   2. exact dedup   — one shuffle on the normalized content hash;
  *   3. near dedup    — MinHash/LSH bucket join, keeps min-id per pair
  *                      cluster (union-find-free greedy: drop any doc
  *                      that has a near-dup with a smaller id);
  *   4. sequence packing — the surviving stream concatenated per source
  *                      and cut into 256-token training sequences
  *                      (TextOps.packSequencesOver);
  *   5. partition + write — cleaned corpus parquet partitioned by lang,
  *                      the packed-sequence manifest, and a per-stage
  *                      survival report.
  *
  * Usage: runMain graft.ext.CorpusPipeline [sfDir] [outDir]
  */
object CorpusPipeline {

  final case class StageCounts(input: Long, afterQuality: Long,
                               afterExact: Long, afterNear: Long,
                               sequences: Long)

  def run(spark: SparkSession, sfDir: String, outDir: String,
          minQuality: Double = 0.5, jaccardThreshold: Double = 0.8): StageCounts = {
    // 0. PII scrub — BEFORE any content derivation, so hashes, shingles
    // and packed sequences never embed an email/phone/id/IP (the order a
    // compliant pipeline requires: scrubbing after dedup would leave PII
    // in the dedup keys and the dropped-duplicate audit trail). Per-row
    // regexp chain, no shuffle; oracle-verified as q_pii_scrub, planted
    // shapes covered by PiiScrubSpec (the harness corpus itself carries
    // no PII, so here it is a verified no-op).
    val docs = graft.Tables.documents(spark, sfDir)
      .withColumn("text", graft.queries.TextOps.scrubPii(col("text")))
    val input = docs.count()

    // 1. quality gate (same scoring as q_text_stats)
    val scored = docs
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n_tokens", size(col("toks")).cast("double"))
      .withColumn("uniq_ratio", size(array_distinct(col("toks"))) / col("n_tokens"))
      .withColumn("stop_ratio", expr(
        "size(filter(toks, t -> t IN ('the', 'a', 'of', 'and', 'to', 'in')))") / col("n_tokens"))
      .withColumn("quality_score",
        lit(0.3) * least(col("n_tokens") / 100.0, lit(1.0))
          + lit(0.4) * col("uniq_ratio")
          + lit(0.3) * (lit(1.0) - col("stop_ratio")))
    val quality = scored.filter(col("quality_score") >= minQuality)
      .select(docs.columns.map(col).toSeq: _*)
    val nQuality = quality.count()

    // 2. exact dedup — keep min doc_id per TRUE content hash. (The
    // sorted-distinct-token normalized hash of q_dedup_exact is too
    // aggressive as a removal rule on a small-vocabulary corpus —
    // unrelated docs can share a token SET; permuted near-dups are the
    // near-dedup stage's job.)
    val exact = quality
      .withColumn("content_hash", md5(col("text")))
      .withColumn("canonical", min(col("doc_id")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("content_hash"))))
      .filter(col("doc_id") === col("canonical"))
      .drop("content_hash", "canonical")
    val nExact = exact.count()

    // 3. near dedup — drop docs having a MinHash-verified near-dup with a
    // smaller id. Reuses the verified operator for candidate pairs.
    exact.createOrReplaceTempView("corpus_stage2")
    val pairs = nearDupPairs(spark, exact, jaccardThreshold)
    val losers = pairs.select(col("doc_b").as("doc_id")).distinct()
    val near = exact.join(losers, Seq("doc_id"), "left_anti")
    val nNear = near.count()

    // 4. pack the cleaned stream into fixed-budget training sequences
    val seqs = graft.queries.TextOps.packSequencesOver(near, 256)
    seqs.write.mode("overwrite").parquet(s"$outDir/sequences")
    val nSeqs = spark.read.parquet(s"$outDir/sequences").count()

    // 5. write partitioned by lang + report
    near.write.mode("overwrite").partitionBy("lang").parquet(s"$outDir/corpus_clean")
    val report = StageCounts(input, nQuality, nExact, nNear, nSeqs)
    import spark.implicits._
    Seq(("input", report.input), ("after_quality", report.afterQuality),
      ("after_exact_dedup", report.afterExact), ("after_near_dedup", report.afterNear),
      ("training_sequences", report.sequences))
      .toDF("stage", "docs")
      .coalesce(1).write.mode("overwrite").option("header", "true").csv(s"$outDir/report")
    report
  }

  /** MinHash/LSH candidate pairs (doc_a < doc_b) with verified Jaccard ≥
    * threshold, over an arbitrary cleaned corpus (same operator shape as
    * queries.Dedup.dedupMinHash, parameterized by input).
    */
  def nearDupPairs(spark: SparkSession, corpus: DataFrame, threshold: Double): DataFrame = {
    val sh = corpus
      .withColumn("toks", split(col("text"), " "))
      .withColumn("shingles", expr(
        """CASE WHEN size(toks) >= 3
          |  THEN array_distinct(transform(sequence(1, size(toks) - 2),
          |                                i -> concat_ws(' ', slice(toks, i, 3))))
          |  ELSE CAST(array() AS ARRAY<STRING>) END""".stripMargin))
      .select(col("doc_id"), col("shingles"))
    val sig = graft.queries.Det.pin(
      sh.withColumn("sig", expr("minhash_sig(shingles)"))
        .select(col("doc_id"), col("sig")))
      .withColumn("bands", expr(
        "transform(sequence(0, 3), k -> md5(concat(CAST(k AS STRING), '|', sig[k*3], '|', sig[k*3+1], '|', sig[k*3+2])))"))
    val exploded = sig.select(col("doc_id"), explode(col("bands")).as("band"))
    val cand = exploded.as("a")
      .join(exploded.as("b"),
        col("a.band") === col("b.band") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .distinct()
    val sa = sh.select(col("doc_id").as("da"), col("shingles").as("shingles_a"))
    val sb = sh.select(col("doc_id").as("db"), col("shingles").as("shingles_b"))
    cand.join(sa, "da").join(sb, "db")
      .withColumn("inter", expr("CAST(size(array_intersect(shingles_a, shingles_b)) AS DOUBLE)"))
      .withColumn("jaccard", col("inter") /
        (size(col("shingles_a")) + size(col("shingles_b")) - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("da").as("doc_a"), col("db").as("doc_b"), col("jaccard"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outDir = args.drop(1).headOption.getOrElse("/tmp/graft_corpus")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .appName("graft-corpus-pipeline").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val r = run(spark, sfDir, outDir)
      println(s"[corpus] input=${r.input} quality=${r.afterQuality} " +
        s"exact=${r.afterExact} near=${r.afterNear} sequences=${r.sequences} -> $outDir")
    } finally spark.stop()
  }
}
