package graft.etl

import org.apache.spark.sql.types._

/** Explicit schemas for the reference's source tables (SURVEY.md §1.3).
  *
  * The reference reads CSV with header=true and NO inferSchema
  * (generate-test-data.scala:227-229), leaving every column a string; our
  * engine declares types up front so the scan is typed end-to-end and the
  * parquet/CSV reader can prune and push down on real types.
  */
object Model {

  /** customers(customer_id, name, email, signup_date, status) —
    * generate_test_data.sh:44, generate-test-data.scala:83-94.
    */
  val customers: StructType = StructType(Seq(
    StructField("customer_id", IntegerType, nullable = false),
    StructField("name", StringType, nullable = false),
    StructField("email", StringType, nullable = true),
    StructField("signup_date", DateType, nullable = true),
    StructField("status", StringType, nullable = false)
  ))

  /** products(product_id, name, category, price, in_stock) —
    * generate_test_data.sh:76, generate-test-data.scala:103-136.
    */
  val products: StructType = StructType(Seq(
    StructField("product_id", IntegerType, nullable = false),
    StructField("name", StringType, nullable = false),
    StructField("category", StringType, nullable = false),
    StructField("price", DoubleType, nullable = false),
    StructField("in_stock", BooleanType, nullable = false)
  ))

  /** orders(order_id, customer_id, product_id, quantity, order_date,
    * total_amount) — generate_test_data.sh:113,
    * generate-test-data.scala:148-170.
    */
  val orders: StructType = StructType(Seq(
    StructField("order_id", IntegerType, nullable = false),
    StructField("customer_id", IntegerType, nullable = false),
    StructField("product_id", IntegerType, nullable = false),
    StructField("quantity", IntegerType, nullable = false),
    StructField("order_date", TimestampType, nullable = false),
    StructField("total_amount", DoubleType, nullable = false)
  ))

  /** Intermediate `sales_data_external` schema — reconstructed from every
    * column Job 2 reads (SURVEY.md §1.3 table; generate-asset.scala:58-143).
    * Summary rows carry NULL ids (README.md:42).
    */
  val salesData: StructType = StructType(Seq(
    StructField("order_id", IntegerType, nullable = true),
    StructField("customer_id", IntegerType, nullable = true),
    StructField("customer_name", StringType, nullable = true),
    StructField("product_id", IntegerType, nullable = true),
    StructField("product_name", StringType, nullable = true),
    StructField("category", StringType, nullable = true),
    StructField("quantity", IntegerType, nullable = true),
    StructField("price", DoubleType, nullable = true),
    StructField("extended_price", DoubleType, nullable = true),
    StructField("discount_amount", DoubleType, nullable = true),
    StructField("final_price", DoubleType, nullable = true),
    StructField("order_date", TimestampType, nullable = true),
    StructField("is_weekend", BooleanType, nullable = true),
    StructField("day_of_week", StringType, nullable = true),
    StructField("month", StringType, nullable = true),
    StructField("year", IntegerType, nullable = true)
  ))

  /** The 23-column asset-table columns (name → Spark SQL type string), per
    * the DDL at generate-asset.scala:296-320: 5 envelope + 7 customer +
    * 2 product + 7 time + 2 lineage. All three branches project into this
    * one spec (SURVEY.md §7.5.3 — no brittle positional alignment).
    */
  val assetColumns: Seq[(String, String)] = Seq(
    "asset_type" -> "string",
    "asset_id" -> "string",
    "asset_name" -> "string",
    "asset_created_date" -> "date",
    "job_id" -> "string",
    // customer dimension
    "customer_id" -> "int",
    "customer_name" -> "string",
    "total_orders" -> "bigint",
    "distinct_products" -> "bigint",
    "total_spent" -> "double",
    "avg_unit_price" -> "double",
    "weekend_spent" -> "double",
    // product dimension
    "product_rank_in_category" -> "bigint",
    "is_top_seller" -> "boolean",
    // time dimension
    "date" -> "date",
    "day_of_week" -> "string",
    "month_name" -> "string",
    "year" -> "int",
    "daily_revenue" -> "double",
    "revenue_7day_avg" -> "double",
    "is_upward_trend" -> "boolean",
    // lineage
    "source_system" -> "string",
    "record_count" -> "bigint"
  )
}
