package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Temporal join operators Spark lacks natively (builder brief:
  * "as-of join, range join"), composed from built-ins the scalable way
  * (preference tier (a) — no custom plan nodes needed):
  *
  *   - AS-OF: the union + ordered-window + last_value(ignoreNulls)
  *     formulation — one shuffle on the key, one per-partition sort; no
  *     row explosion, no range-condition nested loop. The oracle is
  *     DuckDB's native ASOF JOIN, so parity proves the rewrite equals
  *     the first-class operator.
  *   - RANGE: time-bucketed candidate join — each probe lands in its
  *     bucket and each build row replicates into the adjacent buckets
  *     its window can reach, turning the range predicate into an
  *     equi-join on (key, bucket) plus a residual filter. Candidates ∝
  *     bucket occupancy, never |A|×|B|.
  */
object Temporal {
  import Tables._
  import Det._
  type Q = (SparkSession, String) => DataFrame

  /** AS-OF join inside events: for every purchase, the most recent click
    * (inclusive) by the same user. Sort key (ts, kind, event_id) makes
    * same-timestamp resolution deterministic: 'click' < 'purchase'
    * lexicographically, so an equal-ts click is visible to the purchase —
    * matching ASOF JOIN's inclusive `>=`.
    */
  val asofJoin: Q = (spark, dir) => {
    val ev = events(spark, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"), lit("click").as("kind"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"), lit("purchase").as("kind"))
    val tagged = clicks.withColumn("value", lit(null).cast("double"))
      .select(col("user_id"), col("ts"), col("event_id"), col("kind"), col("value"))
      .unionAll(purchases.select(col("user_id"), col("ts"), col("event_id"), col("kind"), col("value")))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("kind"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("last_click_ts",
        last(when(col("kind") === "click", col("ts")), ignoreNulls = true).over(w))
      .filter(col("kind") === "purchase")
      .select(
        col("event_id").as("purchase_id"),
        col("user_id"),
        col("ts").as("purchase_ts"),
        col("value"),
        col("last_click_ts"),
        when(col("last_click_ts").isNotNull,
          expr("(unix_micros(ts) - unix_micros(last_click_ts)) div 1000000"))
          .as("secs_since_click"))
      .orderBy(col("purchase_id"))
  }

  /** Oracle: DuckDB's first-class LEFT ASOF JOIN — if the window rewrite
    * equals this, the composed operator implements true as-of semantics.
    */
  val asofJoinSql: String =
    """WITH clicks AS (
      |  SELECT user_id, ts FROM events WHERE event_type = 'click'),
      |purchases AS (
      |  SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase')
      |SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts, p.value,
      |  c.ts AS last_click_ts,
      |  CASE WHEN c.ts IS NOT NULL
      |       THEN (epoch_us(p.ts) - epoch_us(c.ts)) // 1000000 END AS secs_since_click
      |FROM purchases p
      |ASOF LEFT JOIN clicks c
      |  ON p.user_id = c.user_id AND p.ts >= c.ts
      |ORDER BY purchase_id""".stripMargin

  /** Bucketed RANGE join: for each error event, count and sum the view
    * events by the same user within ±5 minutes. Views replicate into the
    * 3 adjacent 5-minute buckets they can reach; the equi-join on
    * (user_id, bucket) bounds candidates to bucket occupancy, and the
    * residual |Δt| ≤ 5 min filter exacts the semantics.
    */
  val rangeJoin: Q = (spark, dir) => {
    val ev = events(spark, dir)
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("error_id"), col("user_id"),
        col("ts").as("error_ts"),
        (unix_micros(col("ts")) / lit(300000000L)).cast("long").as("bucket"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("view_ts"), col("value").as("view_value"),
        (unix_micros(col("ts")) / lit(300000000L)).cast("long").as("vbucket"))
      .withColumn("bucket", explode(array(col("vbucket") - 1, col("vbucket"), col("vbucket") + 1)))
    errors.join(views, Seq("user_id", "bucket"))
      .filter(abs(unix_micros(col("error_ts")) - unix_micros(col("view_ts"))) <= 300000000L)
      .groupBy(col("error_id"), col("user_id"), col("error_ts"))
      .agg(
        count(lit(1)).as("views_within_5min"),
        r2(dsum(col("view_value"))).as("view_value_sum"))
      .orderBy(col("error_id"))
  }

  /** Oracle: the direct (unbucketed) range predicate — equal results
    * prove the bucketing rewrite is lossless.
    */
  val rangeJoinSql: String =
    s"""SELECT e.event_id AS error_id, e.user_id, e.ts AS error_ts,
       |  count(*) AS views_within_5min,
       |  ${sqlR2(sqlDsum("v.value"))} AS view_value_sum
       |FROM events e
       |JOIN events v
       |  ON e.user_id = v.user_id
       | AND v.event_type = 'view'
       | AND abs(epoch_us(e.ts) - epoch_us(v.ts)) <= 300000000
       |WHERE e.event_type = 'error'
       |GROUP BY 1, 2, 3
       |ORDER BY error_id""".stripMargin

  /** Date-spine gap fill: daily revenue for one nation over a month,
    * INCLUDING the zero days — a generated calendar spine (sequence +
    * explode) left-joined against the sparse per-day aggregate, zeros
    * coalesced in. The time-series completion idiom: without the spine a
    * day with no orders silently vanishes from the series (and from any
    * moving average over it). The spine is O(days) — generated, never
    * shuffled (broadcast side of the join at scale).
    */
  val dateSpine: Q = (spark, dir) => {
    val spine = spark.range(1)
      .select(explode(expr("sequence(DATE'1996-01-01', DATE'1996-01-31')")).as("day"))
    val daily = orders(spark, dir)
      .join(customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .filter(col("c_nationkey") === 3 &&
        col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-02-01").cast("timestamp"))
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(count(lit(1)).as("n_orders"), r2(dsum(col("o_totalprice"))).as("revenue"))
    spine.join(daily, Seq("day"), "left_outer")
      .select(col("day"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        coalesce(col("revenue"), lit(0.0)).as("revenue"))
      .orderBy(col("day"))
  }

  val dateSpineSql: String =
    s"""WITH spine AS (
       |  SELECT unnest(generate_series(DATE '1996-01-01', DATE '1996-01-31', INTERVAL 1 DAY))::DATE AS day),
       |daily AS (
       |  SELECT CAST(o.o_orderdate AS DATE) AS day, count(*) AS n_orders,
       |    ${sqlR2(sqlDsum("o.o_totalprice"))} AS revenue
       |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
       |  WHERE c.c_nationkey = 3
       |    AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
       |    AND o.o_orderdate < TIMESTAMP '1996-02-01 00:00:00'
       |  GROUP BY 1)
       |SELECT s.day,
       |  coalesce(d.n_orders, 0) AS n_orders,
       |  coalesce(d.revenue, 0.0) AS revenue
       |FROM spine s LEFT JOIN daily d ON s.day = d.day
       |ORDER BY s.day""".stripMargin

  /** SCD2 dimension merge — the classic warehouse-maintenance operator:
    * a staging snapshot (deterministically derived: the ~1/4 of
    * customers whose md5(custkey) starts with 0-3 get a new balance and
    * segment) merges into the current dimension as history — changed
    * keys emit a CLOSED old row (valid_to = as-of) plus an open new row;
    * unchanged keys pass through open. Three branches, each a broadcast
    * or map-side filter over one scan of the dimension + one of staging;
    * at 100 TB the same plan runs as a MERGE into a partitioned table.
    * valid_to is null on open rows by design (sort keys are the non-null
    * custkey + valid_from).
    */
  val scd2Merge: Q = (spark, dir) => {
    val cur = customer(spark, dir)
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"), col("c_acctbal"))
    val staged = cur
      .filter(expr("instr('0123', substr(md5(CAST(c_custkey AS STRING)), 1, 1)) > 0"))
      .select(col("c_custkey"), col("c_name"),
        lit("MACHINERY").as("c_mktsegment"),
        Det.r2(col("c_acctbal") + lit(100.0)).as("c_acctbal"))
    val changedKeys = staged.select(col("c_custkey").as("k"))
    val openFrom = lit("2000-01-01").cast("date")
    val asOf = lit(graft.Tables.AsOf).cast("date")
    val unchanged = cur.join(changedKeys, cur("c_custkey") === col("k"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"), col("c_acctbal"),
        openFrom.as("valid_from"), lit(null).cast("date").as("valid_to"),
        lit(true).as("is_current"))
    val closedOld = cur.join(changedKeys, cur("c_custkey") === col("k"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"), col("c_acctbal"),
        openFrom.as("valid_from"), asOf.as("valid_to"), lit(false).as("is_current"))
    val openNew = staged
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"), col("c_acctbal"),
        asOf.as("valid_from"), lit(null).cast("date").as("valid_to"),
        lit(true).as("is_current"))
    unchanged.unionByName(closedOld).unionByName(openNew)
      .orderBy(col("c_custkey"), col("valid_from"))
  }

  val scd2MergeSql: String =
    """WITH cur AS (
      |  SELECT c_custkey, c_name, c_mktsegment, c_acctbal FROM customer),
      |staged AS (
      |  SELECT c_custkey, c_name, 'MACHINERY' AS c_mktsegment,
      |    floor((c_acctbal + 100.0) * 1e2 + 0.5) / 1e2 AS c_acctbal
      |  FROM cur
      |  WHERE instr('0123', substr(md5(CAST(c_custkey AS VARCHAR)), 1, 1)) > 0)
      |SELECT c.c_custkey, c.c_name, c.c_mktsegment, c.c_acctbal,
      |  DATE '2000-01-01' AS valid_from, CAST(NULL AS DATE) AS valid_to,
      |  true AS is_current
      |FROM cur c WHERE c.c_custkey NOT IN (SELECT c_custkey FROM staged)
      |UNION ALL
      |SELECT c.c_custkey, c.c_name, c.c_mktsegment, c.c_acctbal,
      |  DATE '2000-01-01', DATE '2002-01-01', false
      |FROM cur c WHERE c.c_custkey IN (SELECT c_custkey FROM staged)
      |UNION ALL
      |SELECT s.c_custkey, s.c_name, s.c_mktsegment, s.c_acctbal,
      |  DATE '2002-01-01', CAST(NULL AS DATE), true
      |FROM staged s
      |ORDER BY c_custkey, valid_from""".stripMargin

  val queries: Map[String, Q] = Map(
    "q_asof_join" -> asofJoin,
    "q_range_join" -> rangeJoin,
    "q_date_spine" -> dateSpine,
    "q_scd2_merge" -> scd2Merge
  )

  val oracles: Map[String, String] = Map(
    "q_asof_join" -> asofJoinSql,
    "q_range_join" -> rangeJoinSql,
    "q_date_spine" -> dateSpineSql,
    "q_scd2_merge" -> scd2MergeSql
  )
}
