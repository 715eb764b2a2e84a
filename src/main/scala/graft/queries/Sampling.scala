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
    * md5 tie). Bounded two-stage aggregate ([[graft.functions.MinKDraws]]):
    * partial aggregation keeps ≤ 20 candidates per (partition, stratum),
    * so the shuffle ships k rows per stratum per partition instead of the
    * stratum's full population — the r11 fix for the window-rank
    * formulation that sorted three ~50k-row strata to keep 60 rows.
    */
  val sampleStratified: Q = (spark, dir) => {
    val minK = udaf(new graft.functions.MinKDraws(20))
    orders(spark, dir)
      .select(col("o_orderstatus"),
        md5(col("o_orderkey").cast("string")).as("h"),
        col("o_orderkey").as("id"), col("o_totalprice").as("price"))
      .groupBy(col("o_orderstatus"))
      .agg(minK(col("h"), col("id"), col("price")).as("draws"))
      .select(col("o_orderstatus"),
        posexplode(col("draws")).as(Seq("p", "d")))
      .select(col("o_orderstatus"), (col("p") + 1).cast("long").as("draw_rank"),
        col("d.id").as("o_orderkey"), col("d.price").as("o_totalprice"))
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

  /** Deterministic global shuffle into training shards — the last step of
    * a corpus build: every document gets a shard (first hex digit of a
    * salted md5 → 16 shards) and a position within it (rank of the hash
    * inside the shard), which together define the shuffled read order a
    * training job consumes (WebDataset/TFRecord shard semantics). Salted
    * independently of `q_split_assign`'s bucket digits so shard and
    * train/val/test split are uncorrelated, and hash-stable the same
    * way: a document's (shard, relative order) never changes when the
    * corpus grows — only positions after the insertion point slide.
    *
    * Scale shape: hash + shard are per-row maps fused into the scan; the
    * position is one row_number window partitioned on shard_id — one
    * shuffle, each partition ~|corpus|/16, exactly the write pattern of
    * a sharded output job (df.repartition(shard).sortWithinPartitions).
    */
  private val shardSalt = ":shard"

  /** The per-doc (doc_id, n_tokens) frame both shard reports hash:
    * SERVED from the postings artifact's docmeta (r15 — an n_docs-row
    * metadata scan, no text read; coalesce(−1) reconstructs the
    * engine's legacy size(NULL) so served ≡ in-session on any corpus),
    * or derived in-session for the equality twins.
    */
  private def shardDocsServed(spark: SparkSession, dir: String) = {
    val idx = graft.ext.PostingsIndex.servingDir(spark, dir)
    graft.ext.PostingsIndex.docMeta(spark, idx)
      .select(col("doc_id"), coalesce(col("n_tokens"), lit(-1L)).as("n_tokens"))
  }

  private def shardDocsInSession(spark: SparkSession, dir: String) =
    documents(spark, dir)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tokens"))

  val shardShuffle: Q = (spark, dir) => shardShuffleOver(shardDocsServed(spark, dir))

  private[graft] val shardShuffleInSession: Q = (spark, dir) =>
    shardShuffleOver(shardDocsInSession(spark, dir))

  private def shardShuffleOver(perDoc: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("shard_id")).orderBy(col("h"), col("doc_id"))
    perDoc
      .select(col("doc_id"), col("n_tokens"),
        md5(concat(col("doc_id").cast("string"), lit(shardSalt))).as("h"))
      .withColumn("shard_id",
        expr("CAST(instr('0123456789abcdef', substr(h, 1, 1)) - 1 AS BIGINT)"))
      .withColumn("pos_in_shard", row_number().over(w).cast("long"))
      .select(col("doc_id"), col("shard_id"), col("pos_in_shard"), col("n_tokens"))
      .orderBy(col("shard_id"), col("pos_in_shard"))
  }

  val shardShuffleSql: String =
    s"""WITH h AS (
       |  SELECT doc_id,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       |    md5(CAST(doc_id AS VARCHAR) || '$shardSalt') AS h
       |  FROM documents),
       |s AS (
       |  SELECT doc_id, n_tokens, h,
       |    CAST(instr('0123456789abcdef', substr(h, 1, 1)) - 1 AS BIGINT) AS shard_id
       |  FROM h)
       |SELECT doc_id, shard_id,
       |  CAST(row_number() OVER (PARTITION BY shard_id ORDER BY h, doc_id) AS BIGINT) AS pos_in_shard,
       |  n_tokens
       |FROM s ORDER BY shard_id, pos_in_shard""".stripMargin

  /** Shard balance report over the same assignment: doc/token counts and
    * token share per shard — the skew check run before shipping shards
    * (a hot shard starves data-parallel readers). Bounded 16-row output;
    * the token_share window is over the post-agg table.
    */
  val shardStats: Q = (spark, dir) => shardStatsOver(shardDocsServed(spark, dir))

  private[graft] val shardStatsInSession: Q = (spark, dir) =>
    shardStatsOver(shardDocsInSession(spark, dir))

  private def shardStatsOver(perDoc: DataFrame): DataFrame = {
    val w = Window.partitionBy()
    perDoc
      .select(col("n_tokens"),
        md5(concat(col("doc_id").cast("string"), lit(shardSalt))).as("h"))
      .withColumn("shard_id",
        expr("CAST(instr('0123456789abcdef', substr(h, 1, 1)) - 1 AS BIGINT)"))
      .groupBy(col("shard_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("shard_tokens"))
      .withColumn("token_share",
        Det.r6(col("shard_tokens").cast("double") /
          sum(col("shard_tokens")).over(w).cast("double")))
      .orderBy(col("shard_id"))
  }

  val shardStatsSql: String =
    s"""WITH h AS (
       |  SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       |    CAST(instr('0123456789abcdef',
       |      substr(md5(CAST(doc_id AS VARCHAR) || '$shardSalt'), 1, 1)) - 1 AS BIGINT) AS shard_id
       |  FROM documents),
       |a AS (
       |  SELECT shard_id, count(*) AS n_docs,
       |    CAST(sum(n_tokens) AS BIGINT) AS shard_tokens
       |  FROM h GROUP BY shard_id)
       |SELECT shard_id, n_docs, shard_tokens,
       |  ${Det.sqlR6("CAST(shard_tokens AS DOUBLE) / CAST(sum(shard_tokens) OVER () AS DOUBLE)")} AS token_share
       |FROM a ORDER BY shard_id""".stripMargin

  val queries: Map[String, Q] = Map(
    "q_sample_hash" -> sampleHash,
    "q_sample_stratified" -> sampleStratified,
    "q_shard_shuffle" -> shardShuffle,
    "q_shard_stats" -> shardStats
  )

  val oracles: Map[String, String] = Map(
    "q_sample_hash" -> sampleHashSql,
    "q_sample_stratified" -> sampleStratifiedSql,
    "q_shard_shuffle" -> shardShuffleSql,
    "q_shard_stats" -> shardStatsSql
  )
}
