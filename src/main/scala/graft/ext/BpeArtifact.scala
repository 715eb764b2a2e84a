package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Persisted BPE merge tables (r10 VERDICT #8), VERSIONED (r11 VERDICT
  * #7): the learned rules are the MODEL — a production tokenizer trains
  * them once and ships the table to every worker — so they persist to
  * parquet like the ANN index's centroids (ext/AnnIndex), and warm
  * sessions apply them with zero learning aggregations. Reference
  * analogue: the external table Job 2 reads instead of re-deriving
  * (/root/reference/generate-asset.scala:38-40).
  *
  * Version chain layout under `artDir`:
  *   CURRENT      one line: the committed version — flipped by ATOMIC
  *                rename, the only mutation a reader can observe. A
  *                retrain stages the next version COMPLETELY before the
  *                flip, so a reader never sees a half-written table:
  *                it reads version N in full until the instant N+1 is
  *                whole, then N+1 in full (the IncrementalCorpus
  *                snapshot-commit discipline applied to the model).
  *   v<N>/rules1  (rank INT, pat STRING, rep STRING)  16 rows — the
  *                one-level top-16 bigram table q_pack_bpe /
  *                q_bpe_fertility tokenize with;
  *   v<N>/rules2  (ord INT, pattern STRING, replacement STRING)  16
  *                rows — the 4-round × top-4 iterated table q_pack_bpe2
  *                applies, in learned application order;
  *   v<N>/meta    (n_docs, corpus_dir)  1 row, written last within the
  *                stage (belt-and-braces under the CURRENT gate).
  *   audit/       one row per maintenance decision (retrainIfDrifted).
  *
  * Both artifacts are EXACTLY what the in-session chains derive
  * (TextOps.bpeRules1Table / bpeTrainRules2 are the same code the
  * in-plan paths run), so serving from disk is output-identical by
  * construction and the DuckDB oracles — which unroll the training —
  * stay the correctness gate for the served path too.
  */
object BpeArtifact {

  /** Default per-corpus artifact location: md5(corpusDir) under an
    * env-overridable root (same convention as AnnIndex.defaultIndexDir).
    */
  def defaultDir(corpusDir: String): String =
    ArtifactRoots.dirFor("", corpusDir) + "/bpe"

  /** The committed version (0 = none) — the shared snapshot discipline
    * (ext/Versioned, extracted from here at r13). Versions are staged
    * whole before the flip, so version > 0 implies a complete artifact
    * set.
    */
  def currentVersion(artDir: String): Long = Versioned.currentVersion(artDir)

  private def vdir(artDir: String, v: Long) = Versioned.versionDir(artDir, v)

  def isBuilt(artDir: String): Boolean = currentVersion(artDir) > 0

  /** Current = built AND the committed version's meta matches the live
    * corpus by CONTENT FINGERPRINT (ext/Currency — count + max id +
    * sampled content hash, so a same-count in-place swap invalidates)
    * and path; the verdict is session-memoized, so repeat serves run
    * zero currency jobs. A pre-r13 meta has no fingerprint column and
    * reads as stale (one retrain on upgrade).
    */
  def isCurrent(spark: SparkSession, corpusDir: String, artDir: String): Boolean =
    Currency.cached("bpe", corpusDir, artDir) {
      isBuilt(artDir) && {
        val meta = spark.read.parquet(s"${vdir(artDir, currentVersion(artDir))}/meta").head()
        meta.getAs[String]("corpus_dir") == corpusDir &&
          scala.util.Try(meta.getAs[String]("fingerprint")).getOrElse("") ==
            Currency.docsFp(spark, corpusDir).repr
      }
    }

  /** Train both merge tables via the session's shared chains (the pinned
    * vocabulary memo is reused, so a sweep never pays the corpus explode
    * twice), stage them as the NEXT version, and commit by flipping
    * CURRENT — readers keep the pinned version until the swap.
    */
  def save(spark: SparkSession, corpusDir: String, artDir: String,
           keep: Int = 2): Unit = {
    // O_EXCL claim + CAS promote: a racing retrainer fails loudly at the
    // flip instead of silently orphaning this commit (r13 VERDICT #1).
    val (v, parent) = Versioned.claimVersion(artDir)
    val vd = vdir(artDir, v)
    graft.queries.TextOps.bpeRules1Table(spark, corpusDir)
      .coalesce(1).write.mode("overwrite").parquet(s"$vd/rules1")
    val learned = graft.queries.TextOps.bpeTrainRules2(spark, corpusDir)
    spark.createDataFrame(learned.zipWithIndex.map {
      case ((pat, rep), i) => (i, pat, rep)
    }).toDF("ord", "pattern", "replacement")
      .coalesce(1).write.mode("overwrite").parquet(s"$vd/rules2")
    val fp = Currency.docsFp(spark, corpusDir)
    spark.createDataFrame(Seq((fp.n, corpusDir, fp.repr)))
      .toDF("n_docs", "corpus_dir", "fingerprint")
      .coalesce(1).write.mode("overwrite").parquet(s"$vd/meta")
    Versioned.promote(artDir, v, keep, parent)
  }

  /** Build-if-absent. Returns true iff this call TRAINED. `keep` widens
    * the retained-version window to match a Publish time-travel window
    * (r14).
    */
  def ensure(spark: SparkSession, corpusDir: String, artDir: String,
             keep: Int = 2): Boolean =
    if (isCurrent(spark, corpusDir, artDir)) false
    else { save(spark, corpusDir, artDir, keep); true }

  /** Vocab-drift-triggered retrain (mirrors AnnIndex.rebuildIfDrifted
    * for the text model): derive what the LIVE corpus's top-16 bigram
    * merges would be (one vocabulary aggregation — the cheap half of
    * training) and measure overlap with the pinned model's rules1. An
    * overlap below `minOverlap` means the vocabulary the model was
    * fitted to has moved — retrain BOTH tables as a new version and
    * swap; otherwise no-op. Either way the decision is audited and
    * readers serve the pinned version throughout (the swap is the
    * atomic CURRENT flip).
    */
  final case class BpeDrift(action: String, overlap: Double, version: Long)

  def retrainIfDrifted(spark: SparkSession, corpusDir: String, artDir: String,
                       minOverlap: Double = 0.75, keep: Int = 2): BpeDrift = {
    require(isBuilt(artDir), s"no BPE artifact at $artDir — build before maintaining")
    val pinned = rules1(spark, artDir)
      .collect().map(_.getAs[String]("pat")).toSet
    val live = graft.queries.TextOps.bpeRules1Table(spark, corpusDir)
      .collect().map(_.getAs[String]("pat")).toSet
    val overlap =
      if (pinned.isEmpty) 1.0
      else pinned.intersect(live).size.toDouble / pinned.size.toDouble
    val report =
      if (overlap < minOverlap) {
        save(spark, corpusDir, artDir, keep)
        BpeDrift("retrained", overlap, currentVersion(artDir))
      } else BpeDrift("noop", overlap, currentVersion(artDir))
    import spark.implicits._
    Seq((report.action, report.overlap, minOverlap, report.version,
        System.currentTimeMillis()))
      .toDF("action", "overlap", "min_overlap", "version", "decided_at_ms")
      .coalesce(1).write.mode("append").parquet(s"$artDir/audit")
    report
  }

  // ---- loaded artifacts (plain parquet reads — nothing to train) ----

  def rules1(spark: SparkSession, artDir: String): DataFrame =
    spark.read.parquet(s"${vdir(artDir, currentVersion(artDir))}/rules1")

  /** The multi-round table in application order — a 16-row model read,
    * the only job a warm q_pack_bpe2 runs before applying the fold.
    */
  def rules2(spark: SparkSession, artDir: String): Seq[(String, String)] =
    spark.read.parquet(s"${vdir(artDir, currentVersion(artDir))}/rules2").collect()
      .sortBy(_.getAs[Int]("ord"))
      .map(r => (r.getAs[String]("pattern"), r.getAs[String]("replacement")))
      .toSeq

  /** ensure + load against the default location — q_pack_bpe2's rule
    * source: first call in a cold environment pays one training+save,
    * every later call (any session) reads 16 rows from parquet.
    */
  def rules2For(spark: SparkSession, corpusDir: String): Seq[(String, String)] = {
    val d = defaultDir(corpusDir)
    ensure(spark, corpusDir, d)
    rules2(spark, d)
  }
}
