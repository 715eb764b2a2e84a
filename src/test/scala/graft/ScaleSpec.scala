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

  test("AQE splits a skewed join partition at runtime") {
    // A manufactured hot key (98% of rows on k=0) joined under forced
    // sort-merge: with the skew thresholds scaled to test size, AQE must
    // re-plan the hot partition into splits (skew=true on the join) —
    // the runtime answer to skew that salting solves statically
    // (q_salted_agg); at 100 TB both paths matter.
    val restore = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.forceOptimizeSkewedJoin")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
      val skewed = spark.range(200000).select(
        when(col("id") < 196000, 0L).otherwise(pmod(col("id"), lit(97)) + 1L).as("k"),
        col("id").as("v"))
      val dim = spark.range(100).select(col("id").as("k"),
        concat(lit("name_"), col("id")).as("name"))
      // Correctness through the grouped form (a downstream groupBy on the
      // join key suppresses the skew split — it would break the agg's
      // co-partitioning — so the plan assertion uses the plain join).
      val grouped = skewed.join(dim, "k").groupBy(col("k")).agg(count(lit(1)).as("n"))
      assert(grouped.collect().find(_.getLong(0) == 0L).get.getAs[Long]("n") == 196000L)
      val joined = skewed.join(dim, "k")
      assert(joined.collect().length == 200000)
      // The final adaptive plan only prints its tree through explainString.
      val plan = joined.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(plan.contains("skew=true"),
        s"AQE did not mark the skewed join for splitting:\n$plan")
    } finally restore.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
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

  test("sequence packing at volume: 100k docs, tokens conserved, all sequences full") {
    // ~6.7M tokens across 8 source shards — the window-cumsum +
    // range-explode shape must hold well past the harness corpus size
    // (each shard's stream is ~840k tokens ≈ 3.3k sequences).
    val docs = spark.range(100000).select(
      col("id").as("doc_id"),
      concat(lit("s"), pmod(col("id"), lit(8))).as("source"),
      expr("concat_ws(' ', array_repeat('w', CAST(pmod(id, 120) + 8 AS INT)))").as("text"))
    val packed = graft.queries.TextOps.packSequencesOver(docs, 256).collect()
    val expectedTokens = (0L until 100000L).map(i => (i % 120) + 8).sum
    val packedTokens = packed.map(_.getAs[Long]("seq_tokens")).sum
    assert(packedTokens == expectedTokens,
      s"token conservation broke: $packedTokens != $expectedTokens")
    val bySource = packed.groupBy(_.getAs[String]("source"))
    assert(bySource.size == 8)
    bySource.values.foreach { seqs =>
      val sorted = seqs.sortBy(_.getAs[Long]("seq_id"))
      assert(sorted.init.forall(_.getAs[Long]("seq_tokens") == 256L))
      assert(sorted.map(_.getAs[Long]("seq_id")).toSeq ==
        sorted.indices.map(_.toLong))
    }
  }
}
