package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multi-level aggregation surface beyond the reference's flat groupBys
  * (SURVEY.md §2.4 notes rollup/cube/pivot are absent there — a complete
  * engine carries them): ROLLUP, CUBE, and pivot (conditional aggregation).
  *
  * Scale shape: rollup/cube plan through Expand — input × #grouping-sets
  * before the hash aggregate, with map-side partial aggregation keeping
  * shuffle volume ∝ output groups; pivot compiles to one conditional
  * aggregate per pivot value (no extra shuffle vs the plain groupBy).
  */
object Grouping {
  import Tables._
  import Det._
  type Q = (SparkSession, String) => DataFrame

  /** ROLLUP over the region ⊃ nation hierarchy: per-nation, per-region
    * subtotals and a grand total. grouping() flags disambiguate real NULLs
    * from subtotal rows — and order the output deterministically.
    */
  val rollupRegion: Q = (spark, dir) => {
    val c = customer(spark, dir)
    val n = nation(spark, dir)
    val r = region(spark, dir)
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(
        count(lit(1)).as("customer_count"),
        r2(dsum(col("c_acctbal"))).as("total_acctbal"),
        grouping(col("r_name")).cast("long").as("g_region"),
        grouping(col("n_name")).cast("long").as("g_nation"))
      .orderBy(col("g_region"), col("g_nation"), col("r_name"), col("n_name"))
  }

  val rollupRegionSql: String =
    s"""SELECT r.r_name, n.n_name, count(*) AS customer_count,
       |  ${sqlR2(sqlDsum("c.c_acctbal"))} AS total_acctbal,
       |  CAST(grouping(r.r_name) AS BIGINT) AS g_region,
       |  CAST(grouping(n.n_name) AS BIGINT) AS g_nation
       |FROM customer c
       |JOIN nation n ON c.c_nationkey = n.n_nationkey
       |JOIN region r ON n.n_regionkey = r.r_regionkey
       |GROUP BY ROLLUP (r.r_name, n.n_name)
       |ORDER BY g_region, g_nation, r.r_name, n.n_name""".stripMargin

  /** CUBE over (returnflag, linestatus): all four grouping-set levels in
    * one pass.
    */
  val cubeFlags: Q = (spark, dir) =>
    lineitem(spark, dir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("line_count"),
        r2(dsum(col("l_quantity"))).as("total_qty"),
        grouping(col("l_returnflag")).cast("long").as("g_flag"),
        grouping(col("l_linestatus")).cast("long").as("g_status"))
      .orderBy(col("g_flag"), col("g_status"), col("l_returnflag"), col("l_linestatus"))

  val cubeFlagsSql: String =
    s"""SELECT l_returnflag, l_linestatus, count(*) AS line_count,
       |  ${sqlR2(sqlDsum("l_quantity"))} AS total_qty,
       |  CAST(grouping(l_returnflag) AS BIGINT) AS g_flag,
       |  CAST(grouping(l_linestatus) AS BIGINT) AS g_status
       |FROM lineitem
       |GROUP BY CUBE (l_returnflag, l_linestatus)
       |ORDER BY g_flag, g_status, l_returnflag, l_linestatus""".stripMargin

  /** Pivot: order-priority counts per market segment, one column per
    * priority bucket. Spark's pivot IS conditional aggregation — the
    * oracle states the equivalent CASE form explicitly (also the portable
    * formulation when the pivot values must be stable across engines).
    */
  val pivotPriority: Q = (spark, dir) => {
    val c = customer(spark, dir)
    val o = orders(spark, dir)
    c.join(o, c("c_custkey") === o("o_custkey"))
      .withColumn("prio", substring(col("o_orderpriority"), 1, 1))
      .groupBy(col("c_mktsegment"))
      .pivot("prio", Seq("1", "2", "3", "4", "5"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .select(col("c_mktsegment"),
        col("1").as("p1"), col("2").as("p2"), col("3").as("p3"),
        col("4").as("p4"), col("5").as("p5"))
      .orderBy(col("c_mktsegment"))
  }

  val pivotPrioritySql: String =
    """SELECT c.c_mktsegment,
      |  count(*) FILTER (substr(o.o_orderpriority, 1, 1) = '1') AS p1,
      |  count(*) FILTER (substr(o.o_orderpriority, 1, 1) = '2') AS p2,
      |  count(*) FILTER (substr(o.o_orderpriority, 1, 1) = '3') AS p3,
      |  count(*) FILTER (substr(o.o_orderpriority, 1, 1) = '4') AS p4,
      |  count(*) FILTER (substr(o.o_orderpriority, 1, 1) = '5') AS p5
      |FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
      |GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment""".stripMargin

  /** Skew-resistant salted aggregation: stage 1 groups on
    * (key, salt = hash(row) % 16) so a hot key spreads over 16 reducers;
    * stage 2 combines the partials per key. Exact-decimal partials make
    * the two-stage result IDENTICAL to the direct groupBy — which is
    * exactly what the oracle asserts (it computes the plain aggregate).
    * This is the salting pattern PLAN.md prescribes for skewed keys,
    * verified lossless.
    */
  val saltedAgg: Q = (spark, dir) => {
    val l = lineitem(spark, dir)
    val salted = l
      .withColumn("salt", pmod(col("l_orderkey") * 31 + col("l_linenumber"), lit(16)))
      .groupBy(col("l_returnflag"), col("salt"))
      .agg(
        count(lit(1)).as("n_part"),
        sum(col("l_quantity").cast("decimal(28,8)")).as("qty_part"),
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast("decimal(28,8)"))
          .as("rev_part"))
    salted
      .groupBy(col("l_returnflag"))
      .agg(
        sum(col("n_part")).as("line_count"),
        r2(sum(col("qty_part")).cast("double")).as("total_qty"),
        r2(sum(col("rev_part")).cast("double")).as("total_revenue"))
      .orderBy(col("l_returnflag"))
  }

  val saltedAggSql: String =
    s"""SELECT l_returnflag,
       |  count(*) AS line_count,
       |  ${sqlR2(sqlDsum("l_quantity"))} AS total_qty,
       |  ${sqlR2(sqlDsum("l_extendedprice * (1.0 - l_discount)"))} AS total_revenue
       |FROM lineitem
       |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Collection aggregates with deterministic ordering: per-customer
    * sorted order-key array (collect_list is arrival-ordered in Spark —
    * sort_array pins it; DuckDB uses list(... ORDER BY)) plus a sorted
    * string_agg and array ops over the result.
    */
  val collectAgg: Q = (spark, dir) => {
    val o = orders(spark, dir)
    o.filter(col("o_custkey") <= 100)
      .groupBy(col("o_custkey"))
      .agg(
        sort_array(collect_list(col("o_orderkey"))).as("order_keys"),
        count(lit(1)).as("n_orders"))
      .select(
        // order_keys itself stays internal — the driver compare can't hash
        // raw arrays; the array ops are verified through derived scalars.
        col("o_custkey"),
        col("n_orders"),
        size(col("order_keys")).cast("long").as("arr_len"),
        col("order_keys").getItem(0).as("first_key"),
        array_contains(col("order_keys"), 1L).as("has_key_1"),
        concat_ws(",", col("order_keys")).as("keys_csv"))
      .orderBy(col("o_custkey"))
  }

  val collectAggSql: String =
    """SELECT o_custkey,
      |  count(*) AS n_orders,
      |  CAST(len(list_sort(list(o_orderkey))) AS BIGINT) AS arr_len,
      |  list_sort(list(o_orderkey))[1] AS first_key,
      |  list_contains(list_sort(list(o_orderkey)), 1) AS has_key_1,
      |  string_agg(o_orderkey, ',' ORDER BY o_orderkey) AS keys_csv
      |FROM orders
      |WHERE o_custkey <= 100
      |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin

  /** Conditional + argmax aggregates: count_if, bool_and/bool_or, and
    * max_by/min_by. Argmax over doubles is nondeterministic under ties
    * (one o_totalprice tie exists in the data), so the ordering key is a
    * fixed-width string of (price-in-cents, orderkey) — unique and
    * lexicographically ≡ numerically ordered, identical in both engines.
    */
  val conditionalAggs: Q = (spark, dir) =>
    orders(spark, dir)
      .withColumn("price_key", expr(
        "concat(lpad(CAST(floor(o_totalprice * 1e2 + 0.5) AS STRING), 12, '0'), '|', " +
          "lpad(CAST(o_orderkey AS STRING), 12, '0'))"))
      .groupBy(col("o_orderstatus"))
      .agg(
        expr("CAST(count_if(o_totalprice > 200000.0) AS BIGINT)").as("n_big"),
        expr("bool_and(o_totalprice > 0.0)").as("all_positive"),
        expr("bool_or(o_totalprice > 400000.0)").as("any_huge"),
        expr("max_by(o_orderkey, price_key)").as("priciest_order"),
        expr("min_by(o_orderkey, price_key)").as("cheapest_order"),
        max(col("o_totalprice")).as("max_price"),
        min(col("o_totalprice")).as("min_price"))
      .orderBy(col("o_orderstatus"))

  val conditionalAggsSql: String =
    """WITH o AS (
      |  SELECT *, lpad(CAST(CAST(floor(o_totalprice * 1e2 + 0.5) AS BIGINT) AS VARCHAR), 12, '0')
      |    || '|' || lpad(CAST(o_orderkey AS VARCHAR), 12, '0') AS price_key
      |  FROM orders)
      |SELECT o_orderstatus,
      |  CAST(count_if(o_totalprice > 200000.0) AS BIGINT) AS n_big,
      |  bool_and(o_totalprice > 0.0) AS all_positive,
      |  bool_or(o_totalprice > 400000.0) AS any_huge,
      |  arg_max(o_orderkey, price_key) AS priciest_order,
      |  arg_min(o_orderkey, price_key) AS cheapest_order,
      |  max(o_totalprice) AS max_price,
      |  min(o_totalprice) AS min_price
      |FROM o GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** Arbitrary GROUPING SETS — the combination rollup/cube can't express:
    * (region × segment), region-only, and segment-only marginals in ONE
    * Expand pass (3 of the 4 cube levels; skipping the grand total is the
    * point — you pay only for the sets you need).
    */
  val groupingSets: Q = (spark, dir) => {
    val c = customer(spark, dir)
    val n = nation(spark, dir)
    val r = region(spark, dir)
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupingSets(
        Seq(Seq(col("r_name"), col("c_mktsegment")), Seq(col("r_name")), Seq(col("c_mktsegment"))),
        col("r_name"), col("c_mktsegment"))
      .agg(
        count(lit(1)).as("customer_count"),
        r2(dsum(col("c_acctbal"))).as("total_acctbal"),
        grouping(col("r_name")).cast("long").as("g_region"),
        grouping(col("c_mktsegment")).cast("long").as("g_segment"))
      .orderBy(col("g_region"), col("g_segment"), col("r_name"), col("c_mktsegment"))
  }

  val groupingSetsSql: String =
    s"""SELECT r.r_name, c.c_mktsegment, count(*) AS customer_count,
       |  ${sqlR2(sqlDsum("c.c_acctbal"))} AS total_acctbal,
       |  CAST(grouping(r.r_name) AS BIGINT) AS g_region,
       |  CAST(grouping(c.c_mktsegment) AS BIGINT) AS g_segment
       |FROM customer c
       |JOIN nation n ON c.c_nationkey = n.n_nationkey
       |JOIN region r ON n.n_regionkey = r.r_regionkey
       |GROUP BY GROUPING SETS ((r.r_name, c.c_mktsegment), (r.r_name), (c.c_mktsegment))
       |ORDER BY g_region, g_segment, r.r_name, c.c_mktsegment""".stripMargin

  /** Unpivot (wide → long): per-returnflag measure columns melted into
    * (metric, value) rows — the inverse of pivot, Spark's `unpivot`
    * operator. The oracle states the portable UNION ALL form. At scale
    * unpivot is a per-row flatMap (Expand), no shuffle.
    */
  val unpivotMeasures: Q = (spark, dir) =>
    lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        r2(dsum(col("l_quantity"))).as("sum_qty"),
        r2(dsum(col("l_extendedprice"))).as("sum_price"),
        r2(dsum(col("l_discount"))).as("sum_disc"))
      .unpivot(
        ids = Array(col("l_returnflag")),
        values = Array(col("sum_qty"), col("sum_price"), col("sum_disc")),
        variableColumnName = "metric",
        valueColumnName = "value")
      .orderBy(col("l_returnflag"), col("metric"))

  val unpivotMeasuresSql: String =
    s"""WITH w AS (
       |  SELECT l_returnflag,
       |    ${sqlR2(sqlDsum("l_quantity"))} AS sum_qty,
       |    ${sqlR2(sqlDsum("l_extendedprice"))} AS sum_price,
       |    ${sqlR2(sqlDsum("l_discount"))} AS sum_disc
       |  FROM lineitem GROUP BY l_returnflag)
       |SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM w
       |UNION ALL SELECT l_returnflag, 'sum_price', sum_price FROM w
       |UNION ALL SELECT l_returnflag, 'sum_disc', sum_disc FROM w
       |ORDER BY l_returnflag, metric""".stripMargin

  val queries: Map[String, Q] = Map(
    "q_conditional_aggs" -> conditionalAggs,
    "q_collect_agg" -> collectAgg,
    "q_salted_agg" -> saltedAgg,
    "q_rollup_region" -> rollupRegion,
    "q_cube_flags" -> cubeFlags,
    "q_pivot_priority" -> pivotPriority,
    "q_grouping_sets" -> groupingSets,
    "q_unpivot" -> unpivotMeasures
  )

  val oracles: Map[String, String] = Map(
    "q_conditional_aggs" -> conditionalAggsSql,
    "q_collect_agg" -> collectAggSql,
    "q_salted_agg" -> saltedAggSql, // plain aggregate: asserts salting is lossless
    "q_rollup_region" -> rollupRegionSql,
    "q_cube_flags" -> cubeFlagsSql,
    "q_pivot_priority" -> pivotPrioritySql,
    "q_grouping_sets" -> groupingSetsSql,
    "q_unpivot" -> unpivotMeasuresSql
  )
}
