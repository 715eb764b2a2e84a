package graft.ext

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

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
  * VERSION-CHAINED since r13 with O(increment) maintenance (r12 VERDICT
  * #7): the projection is a PER-VECTOR function of a fixed matrix, so —
  * like postings, unlike ANN — append ≡ full rebuild EXACTLY.
  * `appendVecs` projects only the new vectors and commits version N+1
  * (hard links + append + in-staging compaction, CURRENT flipped last);
  * a reader concurrent with any maintenance serves a whole version.
  *
  * Layout under `idxDir`:
  *   CURRENT     committed version (atomic rename — ext/Versioned)
  *   v<N>/proj   (vec_id BIGINT, pvec ARRAY<DOUBLE>[16])  N rows
  *   v<N>/meta   (n_vectors, corpus_dir, schema_version, fingerprint)
  *               — content-fingerprint currency (ext/Currency), so a
  *               same-count in-place corpus swap invalidates
  */
object RpIndex {

  /** v2 = version chain + fingerprint currency (a v1 flat dir has no
    * CURRENT and reads as unbuilt → re-derives once).
    */
  private val SchemaVersion = 2L

  def defaultDir(corpusDir: String): String =
    ArtifactRoots.dirFor("rp_", corpusDir)

  def isBuilt(idxDir: String): Boolean = Versioned.currentVersion(idxDir) > 0

  /** `idxDir` is either an artifact root (CURRENT present → committed
    * version's table) or a PINNED version dir from `servingDir` (a
    * time-travel snapshot's recorded artifact — the dir itself is the
    * root).
    */
  private def tablePath(idxDir: String, name: String): String = {
    val v = Versioned.currentVersion(idxDir)
    if (v > 0) s"${Versioned.versionDir(idxDir, v)}/$name"
    else {
      // Only a v<N>-shaped dir (a Publish pinned version root) may skip
      // CURRENT; see PostingsIndex.tablePath.
      require(new java.io.File(idxDir).getName.matches("v\\d+"),
        s"no committed version under $idxDir")
      s"$idxDir/$name"
    }
  }

  /** The artifact dir to SERVE `corpusDir` from: a Publish time-travel
    * snapshot resolves to the RP version recorded at its publish (no
    * ensure, no currency job — r13 VERDICT #3); anything else ensures
    * the live artifact.
    */
  def servingDir(spark: SparkSession, corpusDir: String): String =
    Publish.pinnedIndexDir(corpusDir, "rp").getOrElse {
      val idx = defaultDir(corpusDir)
      ensure(spark, corpusDir, idx)
      idx
    }

  def build(spark: SparkSession, corpusDir: String, idxDir: String,
            keep: Int = 2): Unit = {
    val (v, parent) = Versioned.claimVersion(idxDir)
    val vd = Versioned.versionDir(idxDir, v)
    graft.queries.Similarity.rpProjectInSession(spark, corpusDir)
      .write.mode(SaveMode.Overwrite).parquet(s"$vd/proj")
    val fp = Currency.vecsFp(spark, corpusDir)
    // Segment bloom over the indexed vec_ids (ext.SegmentBlooms): the
    // O(increment) rung of appendVecs' disjointness gate — a
    // non-monotone-but-disjoint feed is admitted without ever reading
    // the committed proj table.
    SegmentBlooms.writeBloom(spark.read.parquet(s"$vd/proj"), "vec_id",
      s"$vd/blooms", fp.n)
    writeMeta(spark, vd, fp, corpusDir)
    Versioned.promote(idxDir, v, keep, parent)
  }

  /** The committed (or pinned) version's segment blooms — spec hook. */
  private[graft] def blooms(idxDir: String): Seq[org.apache.spark.util.sketch.BloomFilter] =
    SegmentBlooms.bloomsAt(tablePath(idxDir, "blooms"))

  private def writeMeta(spark: SparkSession, versionDir: String,
                        fp: Currency.Fp, corpusDir: String): Unit =
    spark.createDataFrame(Seq((fp.n, corpusDir, SchemaVersion, fp.repr)))
      .toDF("n_vectors", "corpus_dir", "schema_version", "fingerprint")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$versionDir/meta")

  private def isCurrent(spark: SparkSession, corpusDir: String, idxDir: String): Boolean =
    Currency.cached("rp", corpusDir, idxDir) {
      isBuilt(idxDir) && {
        val meta = spark.read.parquet(tablePath(idxDir, "meta")).head()
        scala.util.Try(meta.getAs[Long]("schema_version")).getOrElse(0L) == SchemaVersion &&
          meta.getAs[String]("corpus_dir") == corpusDir &&
          scala.util.Try(meta.getAs[String]("fingerprint")).getOrElse("") ==
            Currency.vecsFp(spark, corpusDir).repr
      }
    }

  /** Build-if-absent. Returns true iff this call DERIVED. `keep` widens
    * the retained-version window to match a Publish time-travel window
    * (r14) so a pinned snapshot serve outlives later publishes.
    */
  def ensure(spark: SparkSession, corpusDir: String, idxDir: String,
             keep: Int = 2): Boolean =
    if (isCurrent(spark, corpusDir, idxDir)) false
    else { build(spark, corpusDir, idxDir, keep); true }

  def proj(spark: SparkSession, idxDir: String): DataFrame =
    spark.read.parquet(tablePath(idxDir, "proj"))

  /** O(increment) maintenance: project ONLY `newVecs` (vec_id,
    * embedding) and commit old∪new as version N+1. Exact-equal to a
    * full rebuild over the union — the projection is per-vector and the
    * decimal sums are order-free — so there is no drift concept and no
    * rebuild trigger, just growth (the postings property; RpIndexSpec
    * pins bit-equality). The fingerprint components merge (count adds,
    * max maxes, sample-hash sums), so the new meta is derived from the
    * old meta + one scan of the increment — old vectors are never read.
    */
  def appendVecs(spark: SparkSession, idxDir: String, newVecs: DataFrame,
                 compactFileBound: Int = 64, keep: Int = 2): Unit = {
    require(isBuilt(idxDir), s"no RP artifact at $idxDir — build before appending")
    // The parent this append stages off — promote CAS-checks against it
    // (r13 VERDICT #1: a racing maintainer fails loudly at the flip).
    val parentV = Versioned.currentVersion(idxDir)
    val cvd = Versioned.versionDir(idxDir, parentV)
    val meta = spark.read.parquet(s"$cvd/meta").head()
    val oldFp = Currency.parse(
      scala.util.Try(meta.getAs[String]("fingerprint")).getOrElse("0|0|0"))
    // append ≡ rebuild holds only for a DISJOINT increment (r13 VERDICT
    // #2): a replayed batch would double-project vec_ids and corrupt the
    // incremental fingerprint. Gate ladder: monotone max-id (no committed
    // read) → segment-bloom OR-probe (O(increment) — r14 VERDICT #2,
    // extending the postings rung here) → exact semi-join against the
    // committed proj table (every indexed vec_id) only for bloom
    // candidates or a bloom-less pre-r15 artifact.
    Gate.requireDisjoint(newVecs, "vec_id", oldFp.maxId,
      spark.read.parquet(s"$cvd/proj"), "rp-projection",
      SegmentBlooms.bloomsAt(s"$cvd/blooms"))
    val vd = newVecs.select(col("vec_id"),
      expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("emb_d"))
    val (newV, _) = Versioned.claimVersion(idxDir)
    val nvd = Versioned.versionDir(idxDir, newV)
    Versioned.linkTable(spark, s"$cvd/proj", s"$nvd/proj")
    graft.queries.Similarity.rpProjectVecs(spark, vd)
      .write.mode(SaveMode.Append).parquet(s"$nvd/proj")
    if (Compaction.dataFiles(spark, s"$nvd/proj").size > compactFileBound) {
      val tmp = s"$nvd/proj.compacting"
      Compaction.compact(spark, s"$nvd/proj", tmp)
      Versioned.deleteRecursively(new java.io.File(s"$nvd/proj"))
      java.nio.file.Files.move(java.nio.file.Paths.get(tmp),
        java.nio.file.Paths.get(s"$nvd/proj"))
    }
    val addFp = Currency.fp(newVecs, "vec_id", element_at(col("embedding"), 1))
    val fp = Currency.Fp(oldFp.n + addFp.n,
      math.max(oldFp.maxId, addFp.maxId), oldFp.sampleHash + addFp.sampleHash)
    SegmentBlooms.carryAndAppend(s"$cvd/blooms", s"$nvd/blooms",
      newVecs, "vec_id", addFp.n,
      spark.read.parquet(s"$nvd/proj"), fp.n, compactFileBound)
    writeMeta(spark, nvd, fp, meta.getAs[String]("corpus_dir"))
    Versioned.promote(idxDir, newV, keep, parentV)
  }
}
