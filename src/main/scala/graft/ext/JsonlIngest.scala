package graft.ext

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSONL (line-delimited JSON) ingest — the format crawl dumps and most
  * corpus interchange actually arrive in. The operational contract a
  * 100 TB ingest needs, none of which `spark.read.json` gives by
  * default:
  *
  *   - **Explicit schema, never inference.** Schema inference is a full
  *     extra pass over the input, and on dirty data it infers the union
  *     of every malformation ever seen (a single `"n_chars": "12"`
  *     string turns the column into StringType for the whole corpus).
  *   - **Corrupt records quarantined, not dropped or poisoned.**
  *     PERMISSIVE mode + a `_corrupt_record` column splits the input
  *     into a clean frame (schema-typed) and a quarantine frame holding
  *     the raw offending line — auditable, re-parseable after a fix,
  *     and the clean side never silently loses rows the way DROPMALFORMED
  *     does. A REQUIRED field that parses as null is treated as corrupt
  *     too (JSON nulls pass the parser but violate the table contract).
  *   - **Landing as parquet.** JSONL is splittable but re-parses on
  *     every read; the ingest's job is to pay the parse ONCE and land
  *     columnar, partition-sized files downstream scans prune.
  *
  * JSONL stays line-splittable at any size (each line is a record), so
  * the read parallelizes by input split with no coordination.
  */
object JsonlIngest {

  /** The documents-table contract for JSONL ingest (doc_id and text are
    * required; lang/source/n_chars optional-with-default downstream;
    * url optional — when present, CorpusPipeline's stage 1.8 dedups on
    * its TextOps.canonUrlCol canonical form, and absent/null urls pass
    * that stage untouched).
    */
  val documentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType),
    StructField("url", StringType)
  ))

  /** Read `path` as JSONL against `schema`, returning (clean, quarantine).
    * Clean rows carry the schema's columns; quarantine rows carry the raw
    * line (`raw`) for audit/repair. `required` names the fields whose
    * null-ness (JSON null OR absent) also quarantines a structurally
    * valid line — a record with no doc_id cannot enter any downstream
    * dedup/join keyed on it.
    */
  def readSplit(spark: SparkSession, path: String, schema: StructType,
                required: Seq[String]): (DataFrame, DataFrame) = {
    val withCorrupt = StructType(schema.fields :+
      StructField("_corrupt_record", StringType))
    // The corrupt-record column materializes lazily; caching the split
    // point is the documented Spark requirement before filtering on it
    // (SPARK-21610: a bare filter on _corrupt_record is disallowed).
    // Pinned through Det so the session's releasePins discipline frees
    // it with everything else (a bare .cache() here would leak one
    // parsed copy of the input per ingest call).
    val raw = graft.queries.Det.pin(spark.read
      .schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path))
    val requiredOk = required.map(col(_).isNotNull).reduce(_ && _)
    val clean = raw
      .filter(col("_corrupt_record").isNull && requiredOk)
      .select(schema.fieldNames.map(col).toSeq: _*)
    val quarantine = raw
      .filter(col("_corrupt_record").isNotNull || !requiredOk)
      .select(coalesce(col("_corrupt_record"), to_json(struct(
        schema.fieldNames.map(col).toSeq: _*))).as("raw"))
    (clean, quarantine)
  }

  /** Ingest `inPath` (JSONL documents) into `outDir/documents.parquet` +
    * `outDir/quarantine` (raw lines). Returns (cleanRows, quarantinedRows).
    * The parquet landing makes every downstream operator (which reads
    * `<dir>/documents.parquet` via Tables) runnable directly on the
    * ingested corpus.
    *
    * **Gzipped input** (`.jsonl.gz`, how crawl dumps usually arrive) reads
    * transparently — Spark picks the codec by extension — but gzip is NOT
    * splittable: each `.gz` file decompresses in ONE task, so ingest
    * parallelism equals the input file count, not the byte count. A
    * 100 TB dump must arrive as many moderate files (the upstream
    * generator's job); this ingest is then itself the mitigation — the
    * decompress-and-land first pass that pays the single-task read once
    * and lands splittable parquet. `landPartitions` re-spreads the
    * landed files when the input arrived as a few huge archives (without
    * it, one mega-gz would land as one mega parquet file).
    *
    * The quarantine dir is deleted on a clean ingest — an overwrite run
    * with zero corrupt rows must not leave the PREVIOUS run's quarantine
    * lying around for an auditor to misread as belonging to the current
    * landing.
    */
  def ingestDocuments(spark: SparkSession, inPath: String, outDir: String,
                      landPartitions: Option[Int] = None): (Long, Long) = {
    val (clean, quarantine) = readSplit(spark, inPath, documentsSchema,
      required = Seq("doc_id", "text"))
    val landed = landPartitions.map(clean.repartition(_)).getOrElse(clean)
    landed.write.mode(SaveMode.Overwrite).parquet(s"$outDir/documents.parquet")
    val nQuarantine = quarantine.count()
    val qDir = new org.apache.hadoop.fs.Path(s"$outDir/quarantine")
    val fs = qDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (nQuarantine > 0)
      quarantine.write.mode(SaveMode.Overwrite).text(qDir.toString)
    else if (fs.exists(qDir))
      fs.delete(qDir, true)
    val nClean = spark.read.parquet(s"$outDir/documents.parquet").count()
    (nClean, nQuarantine)
  }

  /** The repair loop quarantine exists for: after a schema/rule fix (or a
    * required-field policy change), re-parse the quarantined raw lines,
    * APPEND the now-clean survivors to the landed
    * `outDir/documents.parquet`, and shrink the quarantine to the lines
    * that still fail. Returns (recoveredRows, stillQuarantinedRows).
    *
    * The quarantine rewrite goes through a temp dir + rename swap: the
    * still-bad frame's plan reads the quarantine path, and Spark
    * (correctly) refuses to overwrite a path a plan is reading from; the
    * swap also never leaves a half-written quarantine on failure. An
    * empty post-repair quarantine is deleted, keeping outDir internally
    * consistent (same contract as a clean ingest).
    */
  def reingestQuarantine(spark: SparkSession, outDir: String,
                         schema: StructType = documentsSchema,
                         required: Seq[String] = Seq("doc_id", "text")): (Long, Long) = {
    val qPath = new org.apache.hadoop.fs.Path(s"$outDir/quarantine")
    val fs = qPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(qPath)) return (0L, 0L)
    val (clean, stillBad) = readSplit(spark, qPath.toString, schema, required)
    val landedPath = s"$outDir/documents.parquet"
    // Crash idempotency: a crash after a previous repair's append but
    // before its quarantine swap leaves the recovered lines in BOTH the
    // landing and the quarantine, so a naive re-run would append them a
    // second time and land duplicate doc_ids. Anti-joining against the
    // already-landed keys makes the re-run append exactly the rows the
    // landing is missing (zero, after such a crash). Pinned: `fresh` is
    // consumed twice (count + append) and its plan reads the landing —
    // without the pin the append's execution would re-list the landing
    // mid-append.
    val fresh = graft.queries.Det.pin(
      clean.join(spark.read.parquet(landedPath).select("doc_id"),
        Seq("doc_id"), "left_anti"))
    val nRecovered = fresh.count()
    if (nRecovered > 0) {
      fresh.write.mode(SaveMode.Append).parquet(landedPath)
      // The landing just grew under a path this session may hold pinned
      // plans over (Det.memo assumes source immutability) — invalidate,
      // or every downstream operator keeps serving the pre-repair
      // corpus and silently misses the recovered rows.
      spark.catalog.refreshByPath(landedPath)
    }
    val nStill = stillBad.count()
    if (nStill > 0) {
      val tmp = new org.apache.hadoop.fs.Path(s"$outDir/quarantine__reingest_tmp")
      stillBad.write.mode(SaveMode.Overwrite).text(tmp.toString)
      fs.delete(qPath, true)
      fs.rename(tmp, qPath)
    } else {
      fs.delete(qPath, true)
    }
    // The quarantine files just changed under a path this session holds a
    // pinned parse of (readSplit pins, and plan-identical reads SHARE the
    // InMemoryRelation) — invalidate it, or the next repair pass would
    // read the pre-swap quarantine out of the cache.
    spark.catalog.refreshByPath(qPath.toString)
    (nRecovered, nStill)
  }
}
