package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Physical-layout operators: multi-dimensional clustering via Z-order
  * (Morton) interleaving — the data-layout step that makes 2-D predicate
  * pruning work at 100 TB (the technique behind Delta/Iceberg
  * `OPTIMIZE ZORDER BY`).
  *
  * A single-column sort gives file-level min/max skipping on ONE
  * predicate dimension; interleaving the bits of two normalized keys
  * gives a total order whose contiguous ranges are quadtree cells —
  * rectangles in (custkey, orderdate) space — so range-partitioned files
  * carry tight min/max envelopes on BOTH columns and a scan with either
  * predicate prunes most files.
  *
  * Scale shape: rank-normalization bounds come from one 1-row aggregate
  * broadcast to the scan (no collect, no window); the z-value is a
  * per-row codegen'd integer expression; bucketing is the top 5 bits of
  * the interleave — the moral equivalent of `repartitionByRange(32, $"z")`
  * whose boundaries a cluster job would hand to the shuffle writer. The
  * verification output aggregates each bucket's (min,max) envelope per
  * dimension plus its rectangle area: tight areas ≈ corpus_area / 32 are
  * the pruning guarantee made visible, and every cell is integer so the
  * oracle compare is exact.
  */
object Layout {
  import Tables._
  type Q = (SparkSession, String) => DataFrame

  /** Bits per dimension after rank normalization. */
  private val zBits = 16

  /** Top bits of the interleave used as the range-bucket id (32 buckets). */
  private val bucketBits = 5

  /** Morton interleave of two `zBits`-bit ints: x in even bits, y in odd. */
  private def zExpr(x: String, y: String): String =
    (0 until zBits).map { i =>
      s"(shiftright($x, $i) & 1) * ${1L << (2 * i)}L" +
        s" + (shiftright($y, $i) & 1) * ${1L << (2 * i + 1)}L"
    }.mkString("CAST(", " + ", " AS BIGINT)")

  private def zDuck(x: String, y: String): String =
    (0 until zBits).map { i =>
      s"((($x) >> $i) & 1) * ${1L << (2 * i)}" +
        s" + ((($y) >> $i) & 1) * ${1L << (2 * i + 1)}"
    }.mkString("CAST(", " + ", " AS BIGINT)")

  /** Z-order layout audit over `orders` (custkey × orderdate-day): assign
    * every row a Morton bucket and report each bucket's row count and 2-D
    * min/max envelope. Day numbers anchor to a fixed epoch (1995-01-01 —
    * pre-epoch dates simply go negative); scale-factor independence comes
    * from the day_lo/day_hi rank normalization below, not the anchor.
    */
  /** (ck, day, z, bucket) — the shared normalize-and-interleave kernel. */
  private def scaledOrders(spark: SparkSession, dir: String): DataFrame = {
    val base = orders(spark, dir).select(
      col("o_custkey").as("ck"),
      datediff(to_date(col("o_orderdate")), to_date(lit("1995-01-01"))).cast("long").as("day"))
    val bounds = base.agg(
      min(col("ck")).as("ck_lo"), max(col("ck")).as("ck_hi"),
      min(col("day")).as("day_lo"), max(col("day")).as("day_hi"))
    val n16 = 1L << zBits
    base.crossJoin(broadcast(bounds))
      .withColumn("x16", expr(s"CAST(((ck - ck_lo) * $n16) div (ck_hi - ck_lo + 1) AS BIGINT)"))
      .withColumn("y16", expr(s"CAST(((day - day_lo) * $n16) div (day_hi - day_lo + 1) AS BIGINT)"))
      .withColumn("z", expr(zExpr("x16", "y16")))
      .withColumn("bucket", expr(s"z div ${1L << (2 * zBits - bucketBits)}L"))
  }

  val zorderLayout: Q = (spark, dir) => {
    scaledOrders(spark, dir).groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("ck")).as("ck_min"), max(col("ck")).as("ck_max"),
        min(col("day")).as("day_min"), max(col("day")).as("day_max"))
      .withColumn("rect_area",
        (col("ck_max") - col("ck_min") + 1) * (col("day_max") - col("day_min") + 1))
      .orderBy(col("bucket"))
  }

  val zorderLayoutSql: String = {
    val n16 = 1L << zBits
    s"""WITH base AS (
       |  SELECT o_custkey AS ck,
       |    CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS day
       |  FROM orders),
       |bounds AS (
       |  SELECT min(ck) AS ck_lo, max(ck) AS ck_hi,
       |    min(day) AS day_lo, max(day) AS day_hi
       |  FROM base),
       |scaled AS (
       |  SELECT ck, day,
       |    CAST(((ck - ck_lo) * $n16) // (ck_hi - ck_lo + 1) AS BIGINT) AS x16,
       |    CAST(((day - day_lo) * $n16) // (day_hi - day_lo + 1) AS BIGINT) AS y16
       |  FROM base, bounds),
       |zed AS (
       |  SELECT ck, day, ${zDuck("x16", "y16")} AS z FROM scaled),
       |bucketed AS (
       |  SELECT ck, day, z // ${1L << (2 * zBits - bucketBits)} AS bucket FROM zed)
       |SELECT bucket, CAST(count(*) AS BIGINT) AS n,
       |  min(ck) AS ck_min, max(ck) AS ck_max,
       |  min(day) AS day_min, max(day) AS day_max,
       |  (max(ck) - min(ck) + 1) * (max(day) - min(day) + 1) AS rect_area
       |FROM bucketed GROUP BY bucket ORDER BY bucket""".stripMargin
  }

  /** Materialize the layout: range-partition on z (the cluster-side
    * `repartitionByRange(n, $"z")` — range boundaries from Spark's
    * sampled range partitioner, the same mechanism a 1000-executor job
    * uses to hand sorted key ranges to the shuffle writer), sort within
    * partitions, write one file per z-range. Each parquet file then
    * carries tight min/max footer stats on BOTH ck and day, which is
    * the actual data-skipping artifact — [[fileEnvelopes]] reads the
    * realized envelopes back and LayoutSpec drives a query-box pruning
    * simulation against a round-robin baseline.
    */
  def zorderWriteOrders(spark: SparkSession, sfDir: String, outDir: String,
                        nFiles: Int = 32): Unit =
    scaledOrders(spark, sfDir)
      .repartitionByRange(nFiles, col("z"))
      .sortWithinPartitions(col("z"))
      .select(col("ck"), col("day"), col("z"))
      .write.mode("overwrite").parquet(outDir)

  /** Per-file 2-D envelopes of a written layout — the stand-in for the
    * parquet footer min/max a scan's file-skipping consults. */
  def fileEnvelopes(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)
      .withColumn("file", input_file_name())
      .groupBy(col("file"))
      .agg(count(lit(1)).as("n"),
        min(col("ck")).as("ck_min"), max(col("ck")).as("ck_max"),
        min(col("day")).as("day_min"), max(col("day")).as("day_max"))

  val queries: Map[String, Q] = Map(
    "q_zorder_layout" -> zorderLayout
  )

  val oracles: Map[String, String] = Map(
    "q_zorder_layout" -> zorderLayoutSql
  )
}
