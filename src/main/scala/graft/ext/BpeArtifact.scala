package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Persisted BPE merge tables (r10 VERDICT #8): the learned rules are the
  * MODEL — a production tokenizer trains them once and ships the table to
  * every worker — so they persist to parquet like the ANN index's
  * centroids (ext/AnnIndex), and warm sessions apply them with zero
  * learning aggregations. Reference analogue: the external table Job 2
  * reads instead of re-deriving (/root/reference/generate-asset.scala:38-40).
  *
  * Two artifacts under `artDir` (both tiny, both plain parquet):
  *   rules1/  (rank INT, pat STRING, rep STRING)      16 rows — the
  *            one-level top-16 bigram table q_pack_bpe / q_bpe_fertility
  *            tokenize with;
  *   rules2/  (ord INT, pattern STRING, replacement STRING)  16 rows —
  *            the 4-round × top-4 iterated table q_pack_bpe2 applies, in
  *            learned application order;
  *   meta/    (n_docs, corpus_dir)  1 row, written LAST — the validity
  *            marker (a killed save reads as absent and retrains), with
  *            the same count+path currency check as AnnIndex.
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
  def defaultDir(corpusDir: String): String = {
    val root = sys.env.getOrElse("SPARK_GRAFT_INDEX_ROOT",
      sys.props("java.io.tmpdir") + "/graft_ann_index")
    val md = java.security.MessageDigest.getInstance("MD5")
    val h = md.digest(corpusDir.getBytes("UTF-8")).map("%02x".format(_)).mkString
    s"$root/$h/bpe"
  }

  private def metaPath(artDir: String) = s"$artDir/meta"

  def isBuilt(artDir: String): Boolean =
    new java.io.File(s"${metaPath(artDir)}/_SUCCESS").exists()

  /** Current = built AND meta matches the live corpus (document count +
    * path) — one column-pruned scan, negligible next to tokenizing.
    */
  def isCurrent(spark: SparkSession, corpusDir: String, artDir: String): Boolean =
    isBuilt(artDir) && {
      val meta = spark.read.parquet(metaPath(artDir)).head()
      meta.getAs[Long]("n_docs") ==
        graft.Tables.documents(spark, corpusDir).count() &&
        meta.getAs[String]("corpus_dir") == corpusDir
    }

  /** Train both merge tables via the session's shared chains (the pinned
    * vocabulary memo is reused, so a sweep never pays the corpus explode
    * twice) and persist them, meta last.
    */
  def save(spark: SparkSession, corpusDir: String, artDir: String): Unit = {
    graft.queries.TextOps.bpeRules1Table(spark, corpusDir)
      .coalesce(1).write.mode("overwrite").parquet(s"$artDir/rules1")
    val learned = graft.queries.TextOps.bpeTrainRules2(spark, corpusDir)
    spark.createDataFrame(learned.zipWithIndex.map {
      case ((pat, rep), i) => (i, pat, rep)
    }).toDF("ord", "pattern", "replacement")
      .coalesce(1).write.mode("overwrite").parquet(s"$artDir/rules2")
    val n = graft.Tables.documents(spark, corpusDir).count()
    spark.createDataFrame(Seq((n, corpusDir)))
      .toDF("n_docs", "corpus_dir")
      .coalesce(1).write.mode("overwrite").parquet(metaPath(artDir))
  }

  /** Build-if-absent. Returns true iff this call TRAINED. */
  def ensure(spark: SparkSession, corpusDir: String, artDir: String): Boolean =
    if (isCurrent(spark, corpusDir, artDir)) false
    else { save(spark, corpusDir, artDir); true }

  // ---- loaded artifacts (plain parquet reads — nothing to train) ----

  def rules1(spark: SparkSession, artDir: String): DataFrame =
    spark.read.parquet(s"$artDir/rules1")

  /** The multi-round table in application order — a 16-row model read,
    * the only job a warm q_pack_bpe2 runs before applying the fold.
    */
  def rules2(spark: SparkSession, artDir: String): Seq[(String, String)] =
    spark.read.parquet(s"$artDir/rules2").collect()
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
