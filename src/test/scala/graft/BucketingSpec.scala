package graft

import org.apache.spark.sql.functions._
import graft.ext.Bucketing

/** Bucketed co-located join: after the one-time bucketed staging, the
  * fact-fact join and the bucket-key aggregate must run with NO shuffle
  * exchange — the plan shape that amortizes the 100 TB shuffle into a
  * write-once layout.
  */
class BucketingSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("co-bucketed join + bucket-key agg plan has zero shuffle exchanges") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // Force the sort-merge path: a broadcast would also avoid the shuffle
    // but wouldn't prove the bucketed layout is what avoids it.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = Bucketing.coLocatedOrderRevenue(spark, sfDir, buckets = 4)
      val rows = df.collect()
      assert(rows.nonEmpty)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected a sort-merge join:\n$plan")
      assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("bucketed join result equals the plain-parquet join") {
    val bucketed = Bucketing.coLocatedOrderRevenue(spark, sfDir, buckets = 4)
      .orderBy(col("o_orderkey")).collect().toSeq
    val o = Tables.orders(spark, sfDir)
    val rev = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_orderkey"))
      .agg(graft.queries.Det.r2(graft.queries.Det.dsum(
        col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("revenue"))
    val plain = o.join(rev, o("o_orderkey") === rev("l_orderkey"))
      .select(col("o_orderkey"), col("o_orderdate"), col("o_totalprice"), col("revenue"))
      .orderBy(col("o_orderkey")).collect().toSeq
    assert(bucketed == plain)
  }
}
