package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Deterministic sampling — the training-data staple Spark's TABLESAMPLE
  * can't give you across engines (its sampler is RNG-seeded per split).
  * Both variants key on md5 of the row's primary key, so the SAME rows
  * are selected in Spark and DuckDB, on any cluster layout, at any
  * parallelism — and re-running on grown data keeps previously-selected
  * rows selected (hash-stable reservoirs).
  *
  * Scale shape: the hash-mod filter is a per-row map fused into the scan
  * (no shuffle at all); the stratified top-n is one shuffle on the
  * stratum key.
  */
object Sampling {
  import Tables._
  type Q = (SparkSession, String) => DataFrame

  /** bucket ∈ [0, 256) from the first two md5 hex digits — the instr
    * trick both engines compute identically (no integer-parse builtin
    * shared by Spark and DuckDB).
    */
  private def bucketExpr(keyExpr: String): String = {
    def digit(pos: Int) =
      s"(instr('0123456789abcdef', substr(md5(CAST($keyExpr AS STRING)), $pos, 1)) - 1)"
    s"CAST(${digit(1)} * 16 + ${digit(2)} AS BIGINT)"
  }

  private def duckBucket(keyExpr: String): String = {
    def digit(pos: Int) =
      s"(instr('0123456789abcdef', substr(md5(CAST($keyExpr AS VARCHAR)), $pos, 1)) - 1)"
    s"CAST(${digit(1)} * 16 + ${digit(2)} AS BIGINT)"
  }

  /** Hash-mod sample: keep rows whose 256-way md5 bucket < 26 (a ~10.2%
    * deterministic sample of orders). TABLESAMPLE semantics with
    * cross-engine reproducibility.
    */
  val sampleHash: Q = (spark, dir) =>
    orders(spark, dir)
      .withColumn("bucket", expr(bucketExpr("o_orderkey")))
      .filter(col("bucket") < 26)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"), col("bucket"))
      .orderBy(col("o_orderkey"))

  val sampleHashSql: String =
    s"""WITH b AS (
       |  SELECT o_orderkey, o_custkey, o_totalprice,
       |    ${duckBucket("o_orderkey")} AS bucket
       |  FROM orders)
       |SELECT o_orderkey, o_custkey, o_totalprice, bucket
       |FROM b WHERE bucket < 26 ORDER BY o_orderkey""".stripMargin

  /** Stratified deterministic sample: 20 orders per order status, chosen
    * by md5 rank within the stratum (md5 of the unique key is a
    * deterministic uniform shuffle; the key itself breaks the impossible
    * md5 tie). One shuffle on the stratum key; the window is bounded by
    * the per-stratum row count.
    */
  val sampleStratified: Q = (spark, dir) => {
    val w = Window.partitionBy(col("o_orderstatus"))
      .orderBy(md5(col("o_orderkey").cast("string")), col("o_orderkey"))
    orders(spark, dir)
      .withColumn("draw_rank", row_number().over(w).cast("long"))
      .filter(col("draw_rank") <= 20)
      .select(col("o_orderstatus"), col("draw_rank"), col("o_orderkey"),
        col("o_totalprice"))
      .orderBy(col("o_orderstatus"), col("draw_rank"))
  }

  val sampleStratifiedSql: String =
    """WITH r AS (
      |  SELECT o_orderstatus, o_orderkey, o_totalprice,
      |    CAST(row_number() OVER (PARTITION BY o_orderstatus
      |      ORDER BY md5(CAST(o_orderkey AS VARCHAR)), o_orderkey)
      |      AS BIGINT) AS draw_rank
      |  FROM orders)
      |SELECT o_orderstatus, draw_rank, o_orderkey, o_totalprice
      |FROM r WHERE draw_rank <= 20
      |ORDER BY o_orderstatus, draw_rank""".stripMargin

  val queries: Map[String, Q] = Map(
    "q_sample_hash" -> sampleHash,
    "q_sample_stratified" -> sampleStratified
  )

  val oracles: Map[String, String] = Map(
    "q_sample_hash" -> sampleHashSql,
    "q_sample_stratified" -> sampleStratifiedSql
  )
}
