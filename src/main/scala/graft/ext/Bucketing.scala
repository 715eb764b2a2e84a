package graft.ext

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed staging for co-located joins — the 100 TB join strategy the
  * flat parquet layout can't express.
  *
  * A fact-fact join (orders ⋈ lineitem on orderkey) shuffles BOTH sides
  * every run. Bucketing pays that shuffle ONCE at write time: both tables
  * hash-partitioned into the same bucket count on the join key, so every
  * subsequent join (and groupBy on the key) reads bucket i against bucket
  * i with NO exchange — the plan shows zero ShuffleExchange and the join
  * parallelism is the bucket count. At 100 TB this is the difference
  * between re-shuffling 100 TB per query and a one-time staged layout
  * amortized over the whole downstream workload; `BucketingSpec` asserts
  * the shuffle-free plan shape.
  *
  * Spark's bucketed tables live in the session catalog (saveAsTable) —
  * the harness equivalent of the reference's Hive-metastore DDL
  * (generate-asset.scala:294-324), with the in-memory catalog + a
  * spark-warehouse dir standing in for the metastore.
  */
object Bucketing {

  /** Stage `df` as a bucketed, bucket-sorted catalog table. */
  def stageBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Stage orders + lineitem co-bucketed on the order key and return the
    * joined per-order revenue aggregate — the recurring fact-fact join
    * shape, now exchange-free on the read side.
    */
  def coLocatedOrderRevenue(spark: SparkSession, sfDir: String, buckets: Int = 8): DataFrame = {
    stageBucketed(graft.Tables.orders(spark, sfDir), "orders_b", "o_orderkey", buckets)
    stageBucketed(
      graft.Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount")),
      "lineitem_b", "l_orderkey", buckets)
    val o = spark.table("orders_b")
    val l = spark.table("lineitem_b")
    // groupBy on the bucket key first: partial aggregation is already
    // co-partitioned, so neither the agg nor the join exchanges.
    val rev = l.groupBy(col("l_orderkey"))
      .agg(graft.queries.Det.r2(graft.queries.Det.dsum(
        col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("revenue"))
    o.join(rev, o("o_orderkey") === rev("l_orderkey"))
      .select(col("o_orderkey"), col("o_orderdate"), col("o_totalprice"), col("revenue"))
  }
}
