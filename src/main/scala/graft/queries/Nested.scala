package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Nested-type surface: struct construction + field access, array-of-struct
  * build/explode round-trips, and map aggregation/lookup. The reference has
  * no nested data (SURVEY.md §1.1) — this is the extension a complete
  * engine needs for semi-structured lake schemas.
  *
  * Compare-layer rule (learned from q_collect_agg/q_string_funcs): the
  * driver's pandas row-sort cannot hash ARRAY/STRUCT/MAP cells, so nested
  * values are built and consumed INSIDE the query and every output column
  * is a scalar. The oracle states the equivalent flat SQL — which is also
  * how the result set is defined.
  *
  * Scale shape: struct build/prune is free (Catalyst collapses it into the
  * projection and prunes unread fields at the scan); explode of grouped
  * arrays shuffles once on the group key; the map query is two hash
  * aggregations on (user, type) then user.
  */
object Nested {
  import Tables._
  type Q = (SparkSession, String) => DataFrame

  /** Struct build → nested field projection: pack order fields into a
    * 2-level struct, filter and project through the nested paths. The
    * plan should show the struct collapsed away and only the read fields
    * scanned (column pruning through nested access).
    */
  val nestedStruct: Q = (spark, dir) =>
    orders(spark, dir)
      .withColumn("o", struct(
        to_date(col("o_orderdate")).as("d"),
        col("o_totalprice").as("price"),
        struct(
          col("o_orderstatus").as("status"),
          col("o_orderpriority").as("priority")).as("meta")))
      .filter(col("o.price") > 150000.0)
      .select(
        col("o_orderkey"),
        col("o.d").as("order_date"),
        col("o.price").as("price"),
        col("o.meta.status").as("status"),
        lower(col("o.meta.priority")).as("priority_lc"))
      .orderBy(col("o_orderkey"))

  val nestedStructSql: String =
    """SELECT o_orderkey,
      |  CAST(o_orderdate AS DATE) AS order_date,
      |  o_totalprice AS price,
      |  o_orderstatus AS status,
      |  lower(o_orderpriority) AS priority_lc
      |FROM orders WHERE o_totalprice > 150000.0
      |ORDER BY o_orderkey""".stripMargin

  /** Array-of-struct round trip: per customer, collect orders into a
    * sorted array of structs, then posexplode back to rows with the array
    * position. sort_array on structs orders by the first field
    * (o_orderkey, unique) — deterministic in one pass; the oracle states
    * the same result as a partitioned row_number.
    */
  val nestedExplode: Q = (spark, dir) =>
    orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(sort_array(collect_list(
        struct(col("o_orderkey"), col("o_totalprice")))).as("os"))
      .select(col("o_custkey"), posexplode(col("os")).as(Seq("pos", "o")))
      .select(
        col("o_custkey"),
        col("pos").cast("long").as("pos"),
        col("o.o_orderkey").as("o_orderkey"),
        col("o.o_totalprice").as("o_totalprice"))
      .orderBy(col("o_custkey"), col("pos"))

  val nestedExplodeSql: String =
    """SELECT o_custkey,
      |  CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) - 1
      |       AS BIGINT) AS pos,
      |  o_orderkey, o_totalprice
      |FROM orders ORDER BY o_custkey, pos""".stripMargin

  /** Map aggregation + lookup: per user, an event_type → count map built
    * from sorted entries (map_from_entries keeps entry order, so map_keys
    * serializes deterministically), then size / key-list / lookups /
    * value-fold — all consumed down to scalars.
    */
  val nestedMap: Q = (spark, dir) =>
    events(spark, dir)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("user_id"))
      .agg(map_from_entries(array_sort(collect_list(
        struct(col("event_type"), col("n"))))).as("m"))
      .select(
        col("user_id"),
        size(col("m")).cast("long").as("n_types"),
        concat_ws(",", map_keys(col("m"))).as("types_csv"),
        coalesce(element_at(col("m"), "click"), lit(0L)).as("n_click"),
        coalesce(element_at(col("m"), "purchase"), lit(0L)).as("n_purchase"),
        expr("aggregate(map_values(m), CAST(0 AS BIGINT), (a, x) -> a + x)")
          .as("n_total"))
      .orderBy(col("user_id"))

  val nestedMapSql: String =
    """WITH c AS (
      |  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
      |  FROM events GROUP BY user_id, event_type)
      |SELECT user_id,
      |  CAST(count(*) AS BIGINT) AS n_types,
      |  string_agg(event_type, ',' ORDER BY event_type) AS types_csv,
      |  CAST(coalesce(sum(CASE WHEN event_type = 'click' THEN n END), 0)
      |       AS BIGINT) AS n_click,
      |  CAST(coalesce(sum(CASE WHEN event_type = 'purchase' THEN n END), 0)
      |       AS BIGINT) AS n_purchase,
      |  CAST(sum(n) AS BIGINT) AS n_total
      |FROM c GROUP BY user_id ORDER BY user_id""".stripMargin

  val queries: Map[String, Q] = Map(
    "q_nested_struct" -> nestedStruct,
    "q_nested_explode" -> nestedExplode,
    "q_nested_map" -> nestedMap
  )

  val oracles: Map[String, String] = Map(
    "q_nested_struct" -> nestedStructSql,
    "q_nested_explode" -> nestedExplodeSql,
    "q_nested_map" -> nestedMapSql
  )
}
