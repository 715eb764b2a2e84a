package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Join parity queries (SURVEY.md §2.3).
  *
  * J2 — the reconstructed Job 1 three-way equi join (README.md:39) with the
  * derived-column block (§1.3); J1 — the 4-key USING join against a
  * programmatic date dimension (generate-asset.scala:176-188). Small sides
  * are explicitly broadcast: at 100 TB the fact table never shuffles for
  * these joins, only the dimension ships.
  */
object Joins {
  import Tables._
  import Det._
  type Q = (SparkSession, String) => DataFrame

  /** J2 + P5 — detail rows of the reconstructed Job 1: customer ⋈ orders ⋈
    * lineitem with the derived columns of SURVEY.md §1.3
    * (extended_price / discount_amount / final_price / is_weekend /
    * day_of_week / month / year). Dimensions broadcast; lineitem never
    * shuffles.
    */
  val join3Way: Q = (spark, dir) => {
    val l = lineitem(spark, dir)
    val o = orders(spark, dir)
    val c = customer(spark, dir)
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .select(
        col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
        col("c_custkey"), col("c_name"),
        col("l_partkey"), col("l_quantity"),
        r2(col("l_extendedprice")).as("extended_price"),
        r2(col("l_extendedprice") * col("l_discount")).as("discount_amount"),
        r2(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("final_price"),
        col("o_orderdate").as("order_date"),
        dayofweek(col("o_orderdate")).isin(1, 7).as("is_weekend"),
        upper(date_format(col("o_orderdate"), "EEEE")).as("day_of_week"),
        upper(date_format(col("o_orderdate"), "MMMM")).as("month_name"),
        year(col("o_orderdate")).cast("long").as("year")
      )
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  val join3WaySql: String =
    s"""SELECT l.l_orderkey, CAST(l.l_linenumber AS BIGINT) AS l_linenumber,
      |  c.c_custkey, c.c_name, l.l_partkey, l.l_quantity,
      |  ${sqlR2("l.l_extendedprice")} AS extended_price,
      |  ${sqlR2("l.l_extendedprice * l.l_discount")} AS discount_amount,
      |  ${sqlR2("l.l_extendedprice * (1.0 - l.l_discount)")} AS final_price,
      |  o.o_orderdate AS order_date,
      |  dayofweek(o.o_orderdate) IN (0, 6) AS is_weekend,
      |  upper(dayname(o.o_orderdate)) AS day_of_week,
      |  upper(monthname(o.o_orderdate)) AS month_name,
      |  CAST(year(o.o_orderdate) AS BIGINT) AS year
      |FROM lineitem l
      |JOIN orders o ON l.l_orderkey = o.o_orderkey
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |ORDER BY l.l_orderkey, l.l_linenumber""".stripMargin

  /** J1 — multi-key USING join (generate-asset.scala:186-188): a daily
    * revenue aggregate joined with a derived date dimension on FOUR keys
    * (date, day_of_week, month_name, year). The date dim is built
    * programmatically (S4) from the order-date domain — day/month names in
    * java.time enum casing via upper(date_format), the SURVEY §2.3 hazard.
    * The 365-row-scale dim broadcasts.
    */
  val joinMultiKey: Q = (spark, dir) => {
    val o = orders(spark, dir)
    val daily = o
      .groupBy(to_date(col("o_orderdate")).as("order_date"))
      .agg(
        count(lit(1)).as("order_count"),
        r2(dsum(col("o_totalprice"))).as("daily_revenue")
      )
      .withColumn("day_of_week", upper(date_format(col("order_date"), "EEEE")))
      .withColumn("month_name", upper(date_format(col("order_date"), "MMMM")))
      .withColumn("year", year(col("order_date")).cast("long"))
    // Programmatic date dimension over the full order-date domain (S4):
    // spark.range + date_add, not a driver-side Seq — scales to any span.
    val dateDim = spark.range(0, 2557) // days in [1995-01-01, 2001-12-31]
      .select(date_add(lit("1995-01-01").cast("date"), col("id").cast("int")).as("order_date"))
      .withColumn("day_of_week", upper(date_format(col("order_date"), "EEEE")))
      .withColumn("month_name", upper(date_format(col("order_date"), "MMMM")))
      .withColumn("year", year(col("order_date")).cast("long"))
      .withColumn("quarter", quarter(col("order_date")).cast("long"))
      .withColumn("day_of_month", dayofmonth(col("order_date")).cast("long"))
    daily
      .join(broadcast(dateDim), Seq("order_date", "day_of_week", "month_name", "year"))
      .select(col("order_date"), col("day_of_week"), col("month_name"), col("year"),
        col("quarter"), col("day_of_month"), col("order_count"), col("daily_revenue"))
      .orderBy(col("order_date"))
  }

  val joinMultiKeySql: String =
    s"""WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS order_date,
      |    count(*) AS order_count,
      |    ${sqlR2(sqlDsum("o_totalprice"))} AS daily_revenue,
      |    upper(dayname(CAST(o_orderdate AS DATE))) AS day_of_week,
      |    upper(monthname(CAST(o_orderdate AS DATE))) AS month_name,
      |    CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT) AS year
      |  FROM orders GROUP BY 1),
      |date_dim AS (
      |  SELECT CAST(d AS DATE) AS order_date,
      |    upper(dayname(CAST(d AS DATE))) AS day_of_week,
      |    upper(monthname(CAST(d AS DATE))) AS month_name,
      |    CAST(year(CAST(d AS DATE)) AS BIGINT) AS year,
      |    CAST(quarter(CAST(d AS DATE)) AS BIGINT) AS quarter,
      |    CAST(day(CAST(d AS DATE)) AS BIGINT) AS day_of_month
      |  FROM generate_series(DATE '1995-01-01', DATE '2001-12-31', INTERVAL 1 DAY) AS t(d))
      |SELECT d.order_date, d.day_of_week, d.month_name, d.year,
      |  dd.quarter, dd.day_of_month, d.order_count, d.daily_revenue
      |FROM daily d
      |JOIN date_dim dd USING (order_date, day_of_week, month_name, year)
      |ORDER BY d.order_date""".stripMargin

  /** Snowflake rollup — customer ⋈ nation ⋈ region, aggregated per region:
    * exercises chained broadcast joins over the dimension hierarchy.
    */
  val joinSnowflake: Q = (spark, dir) => {
    val c = customer(spark, dir)
    val n = nation(spark, dir)
    val r = region(spark, dir)
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        count(lit(1)).as("customer_count"),
        r2(dsum(col("c_acctbal"))).as("total_acctbal"),
        r4(davg(col("c_acctbal"))).as("avg_acctbal")
      )
      .orderBy(col("r_name"), col("n_name"))
  }

  val joinSnowflakeSql: String =
    s"""SELECT r.r_name, n.n_name, count(*) AS customer_count,
      |  ${sqlR2(sqlDsum("c.c_acctbal"))} AS total_acctbal,
      |  ${sqlR4(sqlDavg("c.c_acctbal"))} AS avg_acctbal
      |FROM customer c
      |JOIN nation n ON c.c_nationkey = n.n_nationkey
      |JOIN region r ON n.n_regionkey = r.r_regionkey
      |GROUP BY r.r_name, n.n_name
      |ORDER BY r.r_name, n.n_name""".stripMargin

  /** Outer/semi/anti surface (beyond the reference, completes the join
    * family): customers without orders (anti), with orders (semi), and a
    * left join null-extension — all over the same keys.
    */
  val joinLeftAnti: Q = (spark, dir) => {
    val c = customer(spark, dir)
    val o = orders(spark, dir)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  val joinLeftAntiSql: String =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      |ORDER BY c_custkey""".stripMargin

  val joinLeftOuter: Q = (spark, dir) => {
    val c = customer(spark, dir)
    val o = orders(spark, dir)
    val perCust = o.groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("order_count"), r2(dsum(col("o_totalprice"))).as("order_total"))
    c.join(perCust, c("c_custkey") === perCust("o_custkey"), "left_outer")
      .select(
        col("c_custkey"), col("c_name"),
        coalesce(col("order_count"), lit(0L)).as("order_count"),
        coalesce(col("order_total"), lit(0.0)).as("order_total")
      )
      .orderBy(col("c_custkey"))
  }

  val joinLeftOuterSql: String =
    s"""SELECT c.c_custkey, c.c_name,
      |  coalesce(t.order_count, 0) AS order_count,
      |  coalesce(t.order_total, 0.0) AS order_total
      |FROM customer c
      |LEFT JOIN (SELECT o_custkey, count(*) AS order_count,
      |             ${sqlR2(sqlDsum("o_totalprice"))} AS order_total
      |           FROM orders GROUP BY o_custkey) t
      |  ON c.c_custkey = t.o_custkey
      |ORDER BY c.c_custkey""".stripMargin

  /** FULL outer join with genuinely one-sided keys on BOTH sides: nations
    * holding top-balance customers vs nations holding top-balance
    * suppliers (the thresholds make each side partial), null-extended in
    * both directions. Shuffle join on the nation key; both inputs are
    * pre-aggregated so the outer join sees one row per key per side.
    */
  val joinFullOuter: Q = (spark, dir) => {
    val ca = customer(spark, dir).filter(col("c_acctbal") > 9900)
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("rich_customers"), r2(dsum(col("c_acctbal"))).as("cust_balance"))
    val sa = supplier(spark, dir).filter(col("s_acctbal") > 9000)
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("rich_suppliers"), r2(dsum(col("s_acctbal"))).as("supp_balance"))
    ca.join(sa, ca("c_nationkey") === sa("s_nationkey"), "full_outer")
      .select(
        coalesce(col("c_nationkey"), col("s_nationkey")).as("nationkey"),
        coalesce(col("rich_customers"), lit(0L)).as("rich_customers"),
        coalesce(col("cust_balance"), lit(0.0)).as("cust_balance"),
        coalesce(col("rich_suppliers"), lit(0L)).as("rich_suppliers"),
        coalesce(col("supp_balance"), lit(0.0)).as("supp_balance"))
      .orderBy(col("nationkey"))
  }

  val joinFullOuterSql: String =
    s"""WITH ca AS (
      |  SELECT c_nationkey, count(*) AS rich_customers,
      |    ${sqlR2(sqlDsum("c_acctbal"))} AS cust_balance
      |  FROM customer WHERE c_acctbal > 9900 GROUP BY c_nationkey),
      |sa AS (
      |  SELECT s_nationkey, count(*) AS rich_suppliers,
      |    ${sqlR2(sqlDsum("s_acctbal"))} AS supp_balance
      |  FROM supplier WHERE s_acctbal > 9000 GROUP BY s_nationkey)
      |SELECT coalesce(ca.c_nationkey, sa.s_nationkey) AS nationkey,
      |  coalesce(ca.rich_customers, 0) AS rich_customers,
      |  coalesce(ca.cust_balance, 0.0) AS cust_balance,
      |  coalesce(sa.rich_suppliers, 0) AS rich_suppliers,
      |  coalesce(sa.supp_balance, 0.0) AS supp_balance
      |FROM ca FULL OUTER JOIN sa ON ca.c_nationkey = sa.s_nationkey
      |ORDER BY nationkey""".stripMargin

  val queries: Map[String, Q] = Map(
    "q_join_3way" -> join3Way,
    "q_join_multikey" -> joinMultiKey,
    "q_join_snowflake" -> joinSnowflake,
    "q_join_left_anti" -> joinLeftAnti,
    "q_join_left_outer" -> joinLeftOuter,
    "q_join_full_outer" -> joinFullOuter
  )

  val oracles: Map[String, String] = Map(
    "q_join_3way" -> join3WaySql,
    "q_join_multikey" -> joinMultiKeySql,
    "q_join_snowflake" -> joinSnowflakeSql,
    "q_join_left_anti" -> joinLeftAntiSql,
    "q_join_left_outer" -> joinLeftOuterSql,
    "q_join_full_outer" -> joinFullOuterSql
  )
}
