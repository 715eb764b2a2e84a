package graft.etl

import java.sql.{Date, Timestamp}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Deterministic in-memory fixtures shaped like the reference's generated
  * test data (generate_test_data.sh: 20 customers / 25 products / 100
  * orders; domains per generate-test-data.scala:83-170) — same shape and
  * domains, original values. A seeded LCG replaces `Random` so every run
  * (and both engines of any comparison) sees identical rows.
  */
object Fixtures {

  /** Tiny deterministic LCG (numerical-recipes constants). */
  private final class Lcg(seed0: Long) {
    private var s: Long = seed0
    def nextInt(bound: Int): Int = {
      s = s * 1664525L + 1013904223L & 0xffffffffL
      ((s >>> 8) % bound).toInt
    }
    def nextDouble2(max: Double): Double = // 2-decimal money, reference-style rounding
      math.round(nextInt(10000) / 10000.0 * max * 100) / 100.0
  }

  val categories: Seq[String] = Seq(
    "Electronics", "Books", "Clothing", "Home", "Sports", "Toys", "Beauty", "Garden")
  val statuses: Seq[String] = Seq("active", "inactive")

  /** Frozen reference instant for "recent orders" (SURVEY.md §7.5.8):
    * orders are generated within 120 days before asOf; the Job 1 recency
    * cutoff is 90 days, so some orders are deliberately filtered.
    */
  val asOf: Date = Date.valueOf("2024-06-30")

  def customers(spark: SparkSession, n: Int = 20): DataFrame = {
    val rnd = new Lcg(1001)
    val rows = (1 to n).map { i =>
      val status = statuses(if (rnd.nextInt(10) < 7) 0 else 1) // ~70% active
      Row(i, s"Customer $i", s"customer$i@example.com",
        Date.valueOf(f"2023-${1 + rnd.nextInt(12)}%02d-${1 + rnd.nextInt(28)}%02d"), status)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), Model.customers)
  }

  def products(spark: SparkSession, n: Int = 25): DataFrame = {
    val rnd = new Lcg(2002)
    val rows = (1 to n).map { i =>
      Row(i, s"Product $i", categories(rnd.nextInt(categories.size)),
        math.max(rnd.nextDouble2(500.0), 1.0), rnd.nextInt(10) < 8) // ~80% in stock
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), Model.products)
  }

  def orders(spark: SparkSession, n: Int = 100, nCustomers: Int = 20, nProducts: Int = 25): DataFrame = {
    val rnd = new Lcg(3003)
    val asOfMs = asOf.getTime
    val rows = (1 to n).map { i =>
      val qty = 1 + rnd.nextInt(10)
      val daysBack = rnd.nextInt(120) // some beyond the 90-day cutoff
      val secOfDay = rnd.nextInt(86400)
      val ts = new Timestamp(asOfMs - daysBack * 86400000L - secOfDay * 1000L)
      val unit = math.max(rnd.nextDouble2(500.0), 1.0)
      Row(i, 1 + rnd.nextInt(nCustomers), 1 + rnd.nextInt(nProducts), qty, ts,
        math.round(unit * qty * 100) / 100.0)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), Model.orders)
  }

  /** Write the fixtures as header CSVs (S5: the reference's data-gen
    * surface — single file via coalesce(1), mode overwrite).
    */
  def writeCsvs(spark: SparkSession, dir: String): Unit = {
    def w(df: DataFrame, name: String): Unit =
      df.coalesce(1).write.option("header", "true").mode("overwrite").csv(s"$dir/$name")
    w(customers(spark), "customers")
    w(products(spark), "products")
    w(orders(spark), "orders")
  }
}
