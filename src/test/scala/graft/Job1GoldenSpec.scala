package graft

import java.sql.{Date, Timestamp}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.etl.{Job1, Model}

/** Golden-value test: Job1.transform on a 4-order literal fixture with
  * every expected output row computed by hand — pins the filter rules,
  * join semantics, discount math, weekend/day-name derivation, and the
  * NULL-keyed summary union exactly.
  */
class Job1GoldenSpec extends SparkSpec {

  private val asOf = Date.valueOf("2024-06-30")

  private def df(schema: org.apache.spark.sql.types.StructType, rows: Row*) =
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)

  private lazy val out = {
    val customers = df(Model.customers,
      Row(1, "Ada", "a@x.com", Date.valueOf("2023-01-01"), "active"),
      Row(2, "Bob", "b@x.com", Date.valueOf("2023-01-01"), "inactive"))
    val products = df(Model.products,
      Row(10, "Widget", "Toys", 5.0, true),
      Row(11, "Gadget", "Toys", 2.0, false))
    val orders = df(Model.orders,
      // kept: active customer, in-stock product, recent (2024-06-15 = Saturday)
      Row(100, 1, 10, 6, Timestamp.valueOf("2024-06-15 10:00:00"), 30.0),
      // kept: quantity below bulk-discount threshold (2024-06-18 = Tuesday)
      Row(101, 1, 10, 2, Timestamp.valueOf("2024-06-18 09:30:00"), 10.0),
      // dropped: customer 2 is inactive
      Row(102, 2, 10, 1, Timestamp.valueOf("2024-06-18 09:30:00"), 5.0),
      // dropped: product 11 not in stock
      Row(103, 1, 11, 1, Timestamp.valueOf("2024-06-18 09:30:00"), 2.0),
      // dropped: older than the 90-day recency cutoff (asOf - 120d)
      Row(104, 1, 10, 1, Timestamp.valueOf("2024-03-01 00:00:00"), 5.0))
    Job1.transform(customers, orders, products, asOf)
  }

  test("detail rows: only the two qualifying orders survive, math exact") {
    val detail = out.filter(col("order_id").isNotNull)
      .orderBy("order_id").collect()
    assert(detail.length == 2)
    val r100 = detail(0)
    // order 100: qty 6 ≥ 5 → 10% bulk discount. ext = 5*6 = 30,
    // discount = 3, final = 27; 2024-06-15 is a Saturday.
    assert(r100.getAs[Int]("order_id") == 100)
    assert(r100.getAs[String]("customer_name") == "Ada")
    assert(r100.getAs[Double]("extended_price") == 30.0)
    assert(r100.getAs[Double]("discount_amount") == 3.0)
    assert(r100.getAs[Double]("final_price") == 27.0)
    assert(r100.getAs[Boolean]("is_weekend"))
    assert(r100.getAs[String]("day_of_week") == "SATURDAY")
    assert(r100.getAs[String]("month") == "JUNE")
    assert(r100.getAs[Int]("year") == 2024)
    val r101 = detail(1)
    // order 101: qty 2 < 5 → no discount. ext = 10, final = 10; Tuesday.
    assert(r101.getAs[Double]("extended_price") == 10.0)
    assert(r101.getAs[Double]("discount_amount") == 0.0)
    assert(r101.getAs[Double]("final_price") == 10.0)
    assert(!r101.getAs[Boolean]("is_weekend"))
    assert(r101.getAs[String]("day_of_week") == "TUESDAY")
  }

  test("summary row: one per category, NULL-keyed, hand-computed sums") {
    val summary = out.filter(col("order_id").isNull).collect()
    assert(summary.length == 1) // only category 'Toys' has detail rows
    val s = summary(0)
    assert(s.getAs[String]("category") == "Toys")
    assert(s.getAs[Int]("quantity") == 8)           // 6 + 2
    assert(s.getAs[Double]("extended_price") == 40.0) // 30 + 10
    assert(s.getAs[Double]("discount_amount") == 3.0)
    assert(s.getAs[Double]("final_price") == 37.0)
    assert(s.isNullAt(s.fieldIndex("customer_id")) && s.isNullAt(s.fieldIndex("order_date")))
  }
}
