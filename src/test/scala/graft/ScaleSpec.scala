package graft

import org.apache.spark.sql.functions._

/** Scale-pattern evidence on real plans: bucketed co-located joins
  * eliminate the join shuffle; approximate aggregates land within their
  * error bounds (the 100 TB replacement for exact countDistinct).
  */
class ScaleSpec extends SparkSpec {

  test("bucketed tables join with zero shuffle exchanges") {
    val dir = java.nio.file.Files.createTempDirectory("buckets").toString
    val sf = "/root/testdata/sf0.001"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_bucket_test LOCATION '$dir/db'")
    spark.sql("USE graft_bucket_test")
    Tables.orders(spark, sf).write
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("orders_b")
    Tables.lineitem(spark, sf).write
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("lineitem_b")
    val joined = spark.table("lineitem_b")
      .join(spark.table("orders_b"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"))
    joined.collect() // force final adaptive plan
    val plan = joined.queryExecution.executedPlan.toString
    // The join itself must not shuffle: both sides are bucketed on the
    // key. (The groupBy after it may exchange on its own key.)
    assert(plan.contains("SortMergeJoin") || plan.contains("BroadcastHashJoin"))
    if (plan.contains("SortMergeJoin")) {
      // count exchanges BELOW the join: bucketed SMJ needs none
      val below = plan.substring(plan.indexOf("SortMergeJoin"))
      assert(!below.contains("Exchange"), s"bucketed join should not shuffle:\n$plan")
    }
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("USE default")
  }

  test("approx_count_distinct within rsd bound of exact") {
    val l = Tables.lineitem(spark, "/root/testdata/sf0.01")
    val row = l.agg(
      countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey"), 0.05).as("approx")).collect()(0)
    val (exact, approx) = (row.getLong(0).toDouble, row.getLong(1).toDouble)
    assert(math.abs(approx - exact) / exact < 0.15, s"approx=$approx exact=$exact")
  }

  test("approx_percentile brackets the exact median") {
    val o = Tables.orders(spark, "/root/testdata/sf0.01")
    val approx = o.agg(percentile_approx(col("o_totalprice"), lit(0.5), lit(1000)))
      .collect()(0).getDouble(0)
    val exact = o.stat.approxQuantile("o_totalprice", Array(0.5), 0.0)(0)
    assert(math.abs(approx - exact) / exact < 0.05)
  }
}
