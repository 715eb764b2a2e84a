package graft.ext

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Persisted random-projection table (r12): the 64→16 JL/Achlioptas
  * projection of the whole corpus, written ONCE and served thereafter —
  * the last whole-corpus derivation that retrained per session
  * (q_embed_rp ran the projection chain twice, q_knn_rp_rerank once
  * more; at 100 TB the projected store is a materialized table a
  * serving fleet scans, never re-derives). The projection matrix is
  * md5-derived and the projected sums are exact decimals, so the
  * persisted vectors are bit-identical to the in-session chain and the
  * served searches reproduce the DuckDB oracles unchanged.
  *
  * Layout under `idxDir` (AnnIndex discipline — meta written LAST as
  * the validity gate; count+path+schema currency on load):
  *   proj/  (vec_id BIGINT, pvec ARRAY<DOUBLE>[16])  N rows
  *   meta/  (n_vectors, corpus_dir, schema_version)  1 row
  */
object RpIndex {

  private val SchemaVersion = 1L

  def defaultDir(corpusDir: String): String = {
    val root = sys.env.getOrElse("SPARK_GRAFT_INDEX_ROOT",
      sys.props("java.io.tmpdir") + "/graft_ann_index")
    val md = java.security.MessageDigest.getInstance("MD5")
    val h = md.digest(corpusDir.getBytes("UTF-8")).map("%02x".format(_)).mkString
    s"$root/rp_$h"
  }

  private def metaPath(idxDir: String) = s"$idxDir/meta"

  def isBuilt(idxDir: String): Boolean =
    new java.io.File(s"${metaPath(idxDir)}/_SUCCESS").exists()

  def build(spark: SparkSession, corpusDir: String, idxDir: String): Unit = {
    graft.queries.Similarity.rpProjectInSession(spark, corpusDir)
      .write.mode(SaveMode.Overwrite).parquet(s"$idxDir/proj")
    val n = graft.Tables.embeddings(spark, corpusDir).count()
    spark.createDataFrame(Seq((n, corpusDir, SchemaVersion)))
      .toDF("n_vectors", "corpus_dir", "schema_version")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(metaPath(idxDir))
  }

  private def isCurrent(spark: SparkSession, corpusDir: String, idxDir: String): Boolean =
    isBuilt(idxDir) && {
      val meta = spark.read.parquet(metaPath(idxDir)).head()
      scala.util.Try(meta.getAs[Long]("schema_version")).getOrElse(0L) == SchemaVersion &&
        meta.getAs[Long]("n_vectors") ==
          graft.Tables.embeddings(spark, corpusDir).count() &&
        meta.getAs[String]("corpus_dir") == corpusDir
    }

  /** Build-if-absent. Returns true iff this call DERIVED. */
  def ensure(spark: SparkSession, corpusDir: String, idxDir: String): Boolean =
    if (isCurrent(spark, corpusDir, idxDir)) false
    else { build(spark, corpusDir, idxDir); true }

  def proj(spark: SparkSession, idxDir: String): DataFrame =
    spark.read.parquet(s"$idxDir/proj")
}
