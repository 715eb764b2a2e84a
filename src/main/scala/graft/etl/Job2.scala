package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Job 2 — the reference's analytical core (generate-asset.scala), built
  * Spark-first: three analytics branches over the shared sales_data input
  * (persisted MEMORY_AND_DISK exactly because four consumers read it —
  * C1, generate-asset.scala:47,380), harmonized through one shared
  * column spec and UNION ALL'd into the 23-column asset table, plus
  * lineage registry rows and a read-back verification query through the
  * SQL surface (S8/S9 → temp views, SURVEY.md §3.3).
  */
object Job2 {

  /** Customer analytics branch (generate-asset.scala:57-84). */
  def customerAnalytics(sales: DataFrame, asOf: java.sql.Date): DataFrame =
    sales.filter(col("customer_id").isNotNull)
      .groupBy(col("customer_id"), col("customer_name"))
      .agg(
        count(col("order_id")).as("total_orders"),
        countDistinct(col("product_id")).as("distinct_products"),
        sum(col("final_price")).as("total_spent"),
        max(col("order_date")).as("last_order_date"),
        min(col("order_date")).as("first_order_date"),
        avg(col("final_price") / col("quantity")).as("avg_unit_price"),
        sum(when(col("is_weekend"), col("final_price")).otherwise(0.0)).as("weekend_spent"),
        sum(when(!col("is_weekend"), col("final_price")).otherwise(0.0)).as("weekday_spent"))
      .withColumn("days_since_last_order",
        datediff(lit(asOf), col("last_order_date")))
      .withColumn("customer_tenure_days",
        datediff(lit(asOf), col("first_order_date")))

  /** Product analytics branch with rank windows (generate-asset.scala:98-116). */
  def productAnalytics(sales: DataFrame): DataFrame = {
    val agg = sales.filter(col("product_id").isNotNull)
      .groupBy(col("product_id"), col("product_name"), col("category"))
      .agg(
        count(col("order_id")).as("order_count"),
        sum(col("quantity")).as("total_quantity"),
        sum(col("final_price")).as("total_revenue"),
        avg(col("price")).as("avg_price"),
        avg(col("discount_amount") / col("extended_price")).as("avg_discount_ratio"),
        countDistinct(col("customer_id")).as("distinct_customers"))
      .withColumn("revenue_per_unit", col("total_revenue") / col("total_quantity"))
    val w = Window.partitionBy(col("category")).orderBy(col("total_revenue").desc)
    agg
      .withColumn("product_rank_in_category", rank().over(w).cast("long"))
      .withColumn("revenue_percentile", percent_rank().over(w))
      .withColumn("is_top_seller", col("product_rank_in_category") <= 3)
  }

  /** Time analytics branch: per-day aggregate, 4-key date-dimension join
    * (J1), and 7/30-day RANGE moving averages via the integer day-number
    * formulation (W4/W5 — the reference's literal date rangeBetween does
    * not analyze in stock Spark, SURVEY.md §2.5).
    */
  def timeAnalytics(sales: DataFrame, spark: SparkSession): DataFrame = {
    val daily = sales.filter(col("order_date").isNotNull)
      .groupBy(
        to_date(col("order_date")).as("date"),
        col("day_of_week"), col("month").as("month_name"), col("year"))
      .agg(
        count(col("order_id")).as("order_count"),
        countDistinct(col("customer_id")).as("distinct_customers"),
        sum(col("final_price")).as("daily_revenue"),
        avg(col("final_price")).as("avg_order_value"),
        sum(col("quantity")).as("total_quantity"))
      .withColumn("revenue_per_customer", col("daily_revenue") / col("distinct_customers"))

    // Programmatic date dimension (S4) — spark.range, not a driver Seq.
    val span = daily.agg(min(col("date")).as("lo"), max(col("date")).as("hi")).collect()(0)
    val (lo, hi) = (span.getDate(0), span.getDate(1))
    val nDays = java.time.temporal.ChronoUnit.DAYS.between(lo.toLocalDate, hi.toLocalDate).toInt + 1
    val dateDim = spark.range(nDays.toLong)
      .select(date_add(lit(lo), col("id").cast("int")).as("date"))
      .withColumn("day_of_week", upper(date_format(col("date"), "EEEE")))
      .withColumn("month_name", upper(date_format(col("date"), "MMMM")))
      .withColumn("year", year(col("date")))
      .withColumn("quarter", quarter(col("date")))
      .withColumn("is_month_start", dayofmonth(col("date")) === 1)

    val joined = daily.join(broadcast(dateDim),
      Seq("date", "day_of_week", "month_name", "year"))

    val byDay = joined.withColumn("day_num",
      datediff(col("date"), lit("1970-01-01").cast("date")))
    val w7 = Window.orderBy(col("day_num")).rangeBetween(-6, 0)
    val w30 = Window.orderBy(col("day_num")).rangeBetween(-29, 0)
    byDay
      .withColumn("revenue_7day_avg", avg(col("daily_revenue")).over(w7))
      .withColumn("revenue_30day_avg", avg(col("daily_revenue")).over(w30))
      .withColumn("orders_7day_avg", avg(col("order_count")).over(w7))
      .withColumn("is_upward_trend",
        col("revenue_7day_avg") > col("revenue_30day_avg") * 1.1)
  }

  /** Project a branch into the shared 23-column asset spec: present
    * columns pass through (cast), absent ones become typed NULLs — the
    * principled form of the reference's three hand-aligned 17-column
    * selects (P2, generate-asset.scala:222-271).
    */
  def harmonize(df: DataFrame): DataFrame =
    df.select(Model.assetColumns.map { case (name, tpe) =>
      if (df.columns.contains(name)) col(name).cast(tpe).as(name)
      else lit(null).cast(tpe).as(name)
    }: _*)

  def run(spark: SparkSession, salesPath: String, assetPath: String,
          asOf: java.sql.Date, jobId: String, lineage: Lineage): Long = {
    val sales = spark.read.parquet(salesPath)
      .persist(StorageLevel.MEMORY_AND_DISK) // C1: read once, 4 consumers

    def envelope(df: DataFrame, assetType: String, idCol: org.apache.spark.sql.Column,
                 nameCol: org.apache.spark.sql.Column): DataFrame =
      df.withColumn("asset_type", lit(assetType))
        .withColumn("asset_id", concat(lit(assetType.take(4).toUpperCase), lit("_"), idCol))
        .withColumn("asset_name", nameCol)
        .withColumn("asset_created_date", lit(asOf))
        .withColumn("job_id", lit(jobId))
        .withColumn("source_system", lit("sales_data_external"))

    val cust = envelope(customerAnalytics(sales, asOf), "customer_analytics",
      col("customer_id"), col("customer_name"))
    val prod = envelope(productAnalytics(sales), "product_analytics",
      col("product_id"), col("product_name"))
      .withColumnRenamed("total_revenue", "total_spent")
    val time = envelope(timeAnalytics(sales, spark), "time_analytics",
      date_format(col("date"), "yyyyMMdd"), concat(lit("day "), col("date")))

    val asset = harmonize(cust).unionAll(harmonize(prod)).unionAll(harmonize(time))

    asset.write.mode("overwrite").parquet(assetPath)
    sales.unpersist()

    // Read-back verification through the SQL surface (S8/S9 as temp view).
    spark.read.parquet(assetPath).createOrReplaceTempView("sales_analytics_asset")
    val n = spark.sql("SELECT COUNT(*) AS c FROM sales_analytics_asset").first().getLong(0)
    spark.sql("SELECT asset_type, COUNT(*) AS n FROM sales_analytics_asset GROUP BY asset_type").show()

    lineage.log(
      source = salesPath,
      target = assetPath,
      transformationCount = 4, // per the reference's declared count (generate-asset.scala:359)
      recordCount = n,
      description = "Job2: customer/product/time analytics -> sales_analytics_asset")
    n
  }
}
