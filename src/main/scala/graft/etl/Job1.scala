package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Job 1 — reconstructed from its README spec (README.md:30-43; the
  * reference repo ships no source for it, SURVEY.md §0.1): filter active
  * customers / recent orders / in-stock products, 3-way join, derived
  * columns, then union of detail rows with per-category summary rows whose
  * id columns are NULL — exactly the mixed detail+summary table Job 2
  * strips with isNotNull filters (generate-asset.scala:58,99,131).
  *
  * Spark-first notes: the dimension joins broadcast (customers/products
  * are small dims; the fact table never shuffles for them); day/month
  * names use upper(date_format(...)) to match java.time enum casing — the
  * J1 join hazard (SURVEY.md §2.3).
  */
object Job1 {

  /** Orders newer than this many days before `asOf` count as "recent"
    * (README.md:37 leaves the threshold unspecified; 90 matches the
    * generator's recency prior, generate-test-data.scala:153-160).
    */
  val RecencyDays = 90

  def transform(customers: DataFrame, orders: DataFrame, products: DataFrame,
                asOf: java.sql.Date): DataFrame = {
    val activeCustomers = customers.filter(col("status") === "active")
    val recentOrders = orders.filter(
      col("order_date") >= date_sub(lit(asOf), RecencyDays).cast("timestamp"))
    val inStock = products.filter(col("in_stock"))

    val detail = recentOrders
      .join(broadcast(activeCustomers), "customer_id")
      .join(broadcast(inStock), "product_id")
      .select(
        col("order_id"),
        col("customer_id"),
        customers("name").as("customer_name"),
        col("product_id"),
        products("name").as("product_name"),
        col("category"),
        col("quantity"),
        col("price"),
        (col("price") * col("quantity")).as("extended_price"),
        // bulk discount: 10% off the extended price for quantity >= 5
        when(col("quantity") >= 5, col("price") * col("quantity") * 0.10)
          .otherwise(0.0).as("discount_amount"),
        col("order_date"),
        dayofweek(col("order_date")).isin(1, 7).as("is_weekend"),
        upper(date_format(col("order_date"), "EEEE")).as("day_of_week"),
        upper(date_format(col("order_date"), "MMMM")).as("month"),
        year(col("order_date")).as("year"))
      .withColumn("final_price", col("extended_price") - col("discount_amount"))

    // Per-category summary rows: NULL id/date columns mark them as summary
    // (README.md:42) — Job 2's isNotNull filters exclude them.
    val summary = detail
      .groupBy(col("category"))
      .agg(
        sum(col("quantity")).cast("int").as("quantity"),
        sum(col("extended_price")).as("extended_price"),
        sum(col("discount_amount")).as("discount_amount"),
        sum(col("final_price")).as("final_price"))
      .select(
        lit(null).cast("int").as("order_id"),
        lit(null).cast("int").as("customer_id"),
        lit(null).cast("string").as("customer_name"),
        lit(null).cast("int").as("product_id"),
        lit(null).cast("string").as("product_name"),
        col("category"),
        col("quantity"),
        lit(null).cast("double").as("price"),
        col("extended_price"),
        col("discount_amount"),
        col("final_price"),
        lit(null).cast("timestamp").as("order_date"),
        lit(null).cast("boolean").as("is_weekend"),
        lit(null).cast("string").as("day_of_week"),
        lit(null).cast("string").as("month"),
        lit(null).cast("int").as("year"))

    val ordered = Model.salesData.fieldNames.map(col).toSeq
    detail.select(ordered: _*).unionAll(summary.select(ordered: _*))
  }

  /** Read CSVs with the declared schemas (S1 — header yes, inferSchema
    * replaced by explicit types), transform, write the external parquet
    * table (S6) and return the row count for the lineage gate.
    */
  def run(spark: SparkSession, csvDir: String, outPath: String,
          asOf: java.sql.Date, lineage: Lineage): Long = {
    def readCsv(name: String, schema: org.apache.spark.sql.types.StructType) =
      spark.read.option("header", "true").schema(schema).csv(s"$csvDir/$name")
    val out = transform(
      readCsv("customers", Model.customers),
      readCsv("orders", Model.orders),
      readCsv("products", Model.products),
      asOf)
    out.write.mode("overwrite").parquet(outPath)
    val n = spark.read.parquet(outPath).count()
    lineage.log(
      source = s"$csvDir/{customers,orders,products}",
      target = outPath,
      transformationCount = 4, // filter, join, derive, summary-union
      recordCount = n,
      description = "Job1: filter+join+derive+summary-union -> sales_data_external")
    n
  }
}
