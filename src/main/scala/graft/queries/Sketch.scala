package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Mergeable cardinality sketches over the `documents` table: KMV
  * (k-minimum-values, a.k.a. bottom-k) distinct-count estimation per
  * source, plus the union/merge law verified as a result cell.
  *
  * Why KMV and not HyperLogLog: both are one-pass, constant-state,
  * mergeable distinct sketches; KMV's state (the k smallest value
  * hashes) and estimator ((k−1)/u_(k)) are plain relational algebra, so
  * the SAME deterministic md5 derivation runs in Spark and in the
  * DuckDB oracle with bit-identical results — where HLL's register math
  * has no engine-portable twin (Spark's approx_count_distinct sketch is
  * opaque, so it could only get a rows-count check, not a cell compare).
  * Accuracy is comparable: SE ≈ 1/√(k−2) (Beyer et al., "On Synopses
  * for Distinct-Value Estimation Under Multiset Operations", SIGMOD'07)
  * — k = 64 gives ~13%.
  *
  * Scale shape — the point of the operator: the production path is ONE
  * aggregation over the raw token stream. The [[graft.functions.KmvBottomK]]
  * aggregator deduplicates in-buffer, so there is NO distinct()
  * pre-shuffle; partial aggregation ships ≤ 64 rows per (partition,
  * source) through the exchange however many billions of raw tokens a
  * source holds, and the merge query shows per-shard sketches unioning
  * into the corpus sketch without re-reading data — exactly how 1000
  * executors sketch independently under a combining coordinator. The
  * exact count / realized-error columns are the verification overlay
  * (they are why the small-SF oracle can grade the sketch at all) and
  * would be dropped in a production run.
  *
  * Determinism: value hash = first 12 hex digits of md5(token) read as
  * a 48-bit BIGINT via the instr('0123456789abcdef', ·) digit idiom
  * (TextOps.splitAssignCol's convention) — exact below 2^53, so the
  * double estimator divides identical operands in both engines; ties
  * break on the token string; the aggregator's total order makes the
  * sketch a pure function of the input set.
  */
object Sketch {
  import Tables._
  import Det._
  type Q = (SparkSession, String) => DataFrame

  /** Sketch size: 64 minima ⇒ ~1/√62 ≈ 13% standard error. */
  val kmvK = 64

  /** 16^12 = 2^48, the hash-space size, exact in double. */
  private val hashSpace = 281474976710656.0

  /** The 48-bit value hash, engine-portable (digit i of md5 · 16^(12−i)). */
  private def hvExpr(e: String): String =
    (1 to 12).map { i =>
      s"(instr('0123456789abcdef', substr(md5($e), $i, 1)) - 1) * ${1L << (4 * (12 - i))}L"
    }.mkString("CAST(", " + ", " AS BIGINT)")

  private def hvDuck(e: String): String =
    (1 to 12).map { i =>
      s"(instr('0123456789abcdef', substr(md5($e), $i, 1)) - 1) * ${1L << (4 * (12 - i))}"
    }.mkString("CAST(", " + ", " AS BIGINT)")

  /** Raw (source, token, hash) stream — NOT distinct; the aggregator
    * collapses duplicates in-buffer. Memoized for the two sketch queries
    * and the exact-count overlay.
    */
  private def hashedToks(spark: SparkSession, dir: String): DataFrame =
    Det.memoMulti(spark, s"sketch.toks:$dir",
        Set("q_sketch_kmv", "q_sketch_kmv_merge")) {
      documents(spark, dir)
        .select(col("source"), explode(split(col("text"), " ")).as("tok"))
        .withColumn("hv", expr(hvExpr("tok")))
    }

  private val hashedToksSql: String =
    s"""ht AS (
       |  SELECT source, tok, ${hvDuck("tok")} AS hv FROM (
       |    SELECT DISTINCT source, unnest(string_split(text, ' ')) AS tok
       |    FROM documents))""".stripMargin

  private def kmvAgg = udaf(new graft.functions.KmvBottomK(kmvK))

  private def estCol(kth: org.apache.spark.sql.Column, nDistinct: org.apache.spark.sql.Column) =
    r6(when(nDistinct <= kmvK, nDistinct.cast("double"))
      .otherwise(lit((kmvK - 1).toDouble) * lit(hashSpace) / kth.cast("double")))

  /** Per-source distinct-token cardinality: the KMV estimate from the
    * bounded sketch, the exact count, and the realized relative error.
    * A source with ≤ k distinct tokens has every hash in its sketch, so
    * the estimator switches to the (exact) sketch size — the standard
    * small-range rule.
    */
  val sketchKmv: Q = (spark, dir) => {
    val ht = hashedToks(spark, dir)
    val sk = ht.groupBy(col("source"))
      .agg(kmvAgg(col("hv"), col("tok")).as("sk"))
      .select(col("source"),
        size(col("sk")).cast("long").as("k_used"),
        element_at(col("sk"), size(col("sk"))).getField("hv").as("kth_hash"))
    val exact = ht.select(col("source"), col("tok")).distinct()
      .groupBy(col("source")).agg(count(lit(1)).as("n_exact"))
    sk.join(exact, "source")
      .withColumn("est_distinct", estCol(col("kth_hash"), col("n_exact")))
      .select(col("source"), col("n_exact"), col("k_used"), col("kth_hash"),
        col("est_distinct"),
        r6(abs(col("est_distinct") - col("n_exact").cast("double"))
          / col("n_exact").cast("double")).as("rel_err"))
      .orderBy(col("source"))
  }

  val sketchKmvSql: String =
    s"""WITH $hashedToksSql,
       |ranked AS (
       |  SELECT source, tok, hv,
       |    row_number() OVER (PARTITION BY source ORDER BY hv, tok) AS rn
       |  FROM ht),
       |exact AS (SELECT source, CAST(count(*) AS BIGINT) AS n_exact FROM ht GROUP BY source),
       |sk AS (
       |  SELECT source, CAST(count(*) AS BIGINT) AS k_used, max(hv) AS kth_hash
       |  FROM ranked WHERE rn <= $kmvK GROUP BY source),
       |est AS (
       |  SELECT s.source, e.n_exact, s.k_used, s.kth_hash,
       |    ${sqlR6(s"CASE WHEN e.n_exact <= $kmvK THEN CAST(e.n_exact AS DOUBLE) " +
                 s"ELSE CAST($kmvK - 1 AS DOUBLE) * 281474976710656.0 / CAST(s.kth_hash AS DOUBLE) END")} AS est_distinct
       |  FROM sk s JOIN exact e ON s.source = e.source)
       |SELECT source, n_exact, k_used, kth_hash, est_distinct,
       |  ${sqlR6("abs(est_distinct - CAST(n_exact AS DOUBLE)) / CAST(n_exact AS DOUBLE)")} AS rel_err
       |FROM est ORDER BY source""".stripMargin

  /** The merge law as a verified result: the corpus-wide estimate
    * computed (a) directly — one global sketch over the raw stream —
    * and (b) by unioning the per-source sketches and re-sketching the
    * union. The two k-th minima must agree EXACTLY: every global
    * minimum is a minimum within its own source, so the per-source cut
    * loses nothing — the invariant that lets shards sketch
    * independently. One row: both estimates, the exact global count,
    * and the equality cell.
    */
  val sketchKmvMerge: Q = (spark, dir) => {
    val ht = hashedToks(spark, dir)
    val direct = ht.agg(kmvAgg(col("hv"), col("tok")).as("sk"))
      .select(element_at(col("sk"), least(size(col("sk")), lit(kmvK)))
        .getField("hv").as("kth_direct"))
    val merged = ht.groupBy(col("source"))
      .agg(kmvAgg(col("hv"), col("tok")).as("sk"))
      .select(explode(col("sk")).as("hvv"))
      .select(col("hvv.hv").as("hv"), col("hvv.v").as("tok"))
      .agg(kmvAgg(col("hv"), col("tok")).as("sk"))
      .select(element_at(col("sk"), least(size(col("sk")), lit(kmvK)))
        .getField("hv").as("kth_merged"))
    val exact = ht.select(col("tok")).distinct().agg(count(lit(1)).as("n_exact"))
    direct.crossJoin(merged).crossJoin(exact)
      .select(
        lit(kmvK.toLong).as("k"),
        col("n_exact"),
        estCol(col("kth_direct"), col("n_exact")).as("est_direct"),
        estCol(col("kth_merged"), col("n_exact")).as("est_merged"),
        (col("kth_direct") === col("kth_merged")).as("merge_exact"))
  }

  val sketchKmvMergeSql: String =
    s"""WITH $hashedToksSql,
       |gtok AS (SELECT DISTINCT tok, hv FROM ht),
       |direct AS (
       |  SELECT max(hv) AS kth_direct FROM (
       |    SELECT hv, row_number() OVER (ORDER BY hv, tok) AS rn FROM gtok) t
       |  WHERE rn <= $kmvK),
       |persrc AS (
       |  SELECT DISTINCT tok, hv FROM (
       |    SELECT tok, hv,
       |      row_number() OVER (PARTITION BY source ORDER BY hv, tok) AS rn
       |    FROM ht) t WHERE rn <= $kmvK),
       |merged AS (
       |  SELECT max(hv) AS kth_merged FROM (
       |    SELECT hv, row_number() OVER (ORDER BY hv, tok) AS rn FROM persrc) t
       |  WHERE rn <= $kmvK),
       |exact AS (SELECT CAST(count(*) AS BIGINT) AS n_exact FROM gtok)
       |SELECT CAST($kmvK AS BIGINT) AS k, e.n_exact,
       |  ${sqlR6(s"CASE WHEN e.n_exact <= $kmvK THEN CAST(e.n_exact AS DOUBLE) " +
               s"ELSE CAST($kmvK - 1 AS DOUBLE) * 281474976710656.0 / CAST(d.kth_direct AS DOUBLE) END")} AS est_direct,
       |  ${sqlR6(s"CASE WHEN e.n_exact <= $kmvK THEN CAST(e.n_exact AS DOUBLE) " +
               s"ELSE CAST($kmvK - 1 AS DOUBLE) * 281474976710656.0 / CAST(m.kth_merged AS DOUBLE) END")} AS est_merged,
       |  d.kth_direct = m.kth_merged AS merge_exact
       |FROM direct d, merged m, exact e""".stripMargin

  val queries: Map[String, Q] = Map(
    "q_sketch_kmv" -> sketchKmv,
    "q_sketch_kmv_merge" -> sketchKmvMerge
  )

  val oracles: Map[String, String] = Map(
    "q_sketch_kmv" -> sketchKmvSql,
    "q_sketch_kmv_merge" -> sketchKmvMergeSql
  )
}
