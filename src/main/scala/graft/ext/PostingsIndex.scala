package graft.ext

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted positional postings (r11 VERDICT #6): the (term, doc_id,
  * pos) inverted index behind phrase search, written ONCE per corpus
  * and served from disk thereafter — the q_phrase_search plan used to
  * re-tokenize the whole corpus SIX times per query (three gram legs +
  * three lookup legs, each re-running split+posexplode); served, every
  * leg is a columnar scan of this table instead. Reference analogue:
  * the external table Job 2 reads instead of re-deriving Job 1's
  * output (/root/reference/generate-asset.scala:38-40).
  *
  * Layout under `idxDir` (AnnIndex discipline — meta written LAST as
  * the validity gate, so a killed build/append reads as absent and
  * rebuilds):
  *   postings/  (doc_id, pos, term)  — range-partitioned BY TERM, so
  *              parquet min/max stats make a single-term lookup skip
  *              every file outside the term's range (the bucketed-by-
  *              term layout a 100 TB postings store would use)
  *   meta/      (n_docs, corpus_dir, schema_version)  1 row
  *
  * Maintenance is append-only: `appendDocs` tokenizes ONLY the new
  * documents (O(increment)) and appends; because postings are a
  * per-document function, append ≡ full rebuild EXACTLY (the property
  * PostingsIndexSpec pins — unlike ANN, there is no frozen-model
  * approximation here). Appends past the file-count bound trigger an
  * in-place compaction (re-sorted by term to restore pruning), staged
  * to a sibling dir and swapped before meta is rewritten — a crash
  * mid-swap leaves meta stale, which reads as absent-and-rebuild,
  * never as a half-compacted serving index.
  */
object PostingsIndex {

  private val SchemaVersion = 1L

  def defaultDir(corpusDir: String): String = {
    val root = sys.env.getOrElse("SPARK_GRAFT_INDEX_ROOT",
      sys.props("java.io.tmpdir") + "/graft_ann_index")
    val md = java.security.MessageDigest.getInstance("MD5")
    val h = md.digest(corpusDir.getBytes("UTF-8")).map("%02x".format(_)).mkString
    s"$root/postings_$h"
  }

  private def metaPath(idxDir: String) = s"$idxDir/meta"

  def isBuilt(idxDir: String): Boolean =
    new java.io.File(s"${metaPath(idxDir)}/_SUCCESS").exists()

  /** Whitespace tokenization with 0-based positions — the exact posting
    * definition the oracle-verified in-session q_phrase_search uses.
    */
  def tokenize(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "term")))

  def build(spark: SparkSession, corpusDir: String, idxDir: String): Unit = {
    val docs = graft.Tables.documents(spark, corpusDir)
    tokenize(docs)
      .repartitionByRange(col("term"), col("doc_id"))
      .write.mode(SaveMode.Overwrite).parquet(s"$idxDir/postings")
    writeMeta(spark, idxDir, docs.count(), corpusDir)
  }

  private def writeMeta(spark: SparkSession, idxDir: String, n: Long,
                        corpusDir: String): Unit =
    spark.createDataFrame(Seq((n, corpusDir, SchemaVersion)))
      .toDF("n_docs", "corpus_dir", "schema_version")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(metaPath(idxDir))

  private def isCurrent(spark: SparkSession, corpusDir: String, idxDir: String): Boolean =
    isBuilt(idxDir) && {
      val meta = spark.read.parquet(metaPath(idxDir)).head()
      scala.util.Try(meta.getAs[Long]("schema_version")).getOrElse(0L) == SchemaVersion &&
        meta.getAs[Long]("n_docs") ==
          graft.Tables.documents(spark, corpusDir).count() &&
        meta.getAs[String]("corpus_dir") == corpusDir
    }

  /** Build-if-absent. Returns true iff this call BUILT. */
  def ensure(spark: SparkSession, corpusDir: String, idxDir: String): Boolean =
    if (isCurrent(spark, corpusDir, idxDir)) false
    else { build(spark, corpusDir, idxDir); true }

  def postings(spark: SparkSession, idxDir: String): DataFrame =
    spark.read.parquet(s"$idxDir/postings")

  /** Streaming maintenance: new documents land as parquet files under
    * `sourceDir`; each micro-batch appends its postings via the SAME
    * `appendDocs` (foreachBatch — identical tokenization, compaction
    * and meta discipline as a hand-run append, so stream-maintained
    * and batch-maintained indexes are the same artifact). Sequential
    * micro-batches are the correctness assumption, as with
    * IncrementalCorpus.incrementalStream.
    */
  def postingsStream(spark: SparkSession, sourceDir: String, idxDir: String,
                     compactFileBound: Int = 64,
                     maxFilesPerTrigger: Option[Int] = None)
  : org.apache.spark.sql.streaming.StreamingQuery = {
    val reader = spark.readStream.schema(graft.streaming.EventStream.docSchema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    reader.parquet(sourceDir).writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) appendDocs(spark, idxDir, batch, compactFileBound)
      }
      .start()
  }

  /** Append-only maintenance: index `newDocs` (tokenize the increment
    * only), compact past `compactFileBound` files, meta rewritten LAST
    * with the grown doc count. Postings are per-document, so the
    * appended index equals a from-scratch build over the union — no
    * drift, no rebuild trigger needed.
    */
  def appendDocs(spark: SparkSession, idxDir: String, newDocs: DataFrame,
                 compactFileBound: Int = 64): Unit = {
    require(isBuilt(idxDir), s"no postings index at $idxDir — build before appending")
    val meta = spark.read.parquet(metaPath(idxDir)).head()
    val nAdd = newDocs.count()
    tokenize(newDocs).write.mode(SaveMode.Append).parquet(s"$idxDir/postings")
    val files = Compaction.dataFiles(spark, s"$idxDir/postings")
    if (files.size > compactFileBound) {
      val nFiles = math.max(1,
        math.ceil(files.map(_._2).sum.toDouble / (128L * 1024 * 1024)).toInt)
      val tmp = s"$idxDir/postings.compacting"
      spark.read.parquet(s"$idxDir/postings")
        .repartitionByRange(nFiles, col("term"), col("doc_id"))
        .write.mode(SaveMode.Overwrite).parquet(tmp)
      val dst = new java.io.File(s"$idxDir/postings")
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).foreach(rm); f.delete()
      }
      rm(dst)
      java.nio.file.Files.move(java.nio.file.Paths.get(tmp), dst.toPath)
    }
    writeMeta(spark, idxDir, meta.getAs[Long]("n_docs") + nAdd,
      meta.getAs[String]("corpus_dir"))
  }
}
