package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Set-operation parity queries (SURVEY.md §2.7) plus the
  * schema-harmonizing projection pattern (P2).
  *
  * The reference's asset table is a positional `union` of three branch
  * projections padded with typed NULLs (generate-asset.scala:222-276) —
  * UNION ALL semantics, no dedup. The brittle 17-column positional
  * alignment is made robust here by deriving all three branches from one
  * shared column-spec list (SURVEY.md §7.5.3).
  */
object SetOps {
  import Tables._
  import Det._
  type Q = (SparkSession, String) => DataFrame

  /** The shared envelope schema all branches project into: (name, type). */
  private val assetColumns: Seq[(String, String)] = Seq(
    "entity_type" -> "string",
    "entity_id" -> "bigint",
    "entity_name" -> "string",
    "category" -> "string",
    "score" -> "double",
    "event_ts" -> "timestamp",
    "flag" -> "boolean"
  )

  /** Pads a branch to the shared schema: present columns pass through,
    * missing ones become typed NULLs — the engine's principled version of
    * the reference's hand-rolled NULL-padded selects (P2).
    */
  private def harmonize(df: DataFrame): DataFrame =
    df.select(assetColumns.map { case (name, tpe) =>
      if (df.columns.contains(name)) col(name).cast(tpe).as(name)
      else lit(null).cast(tpe).as(name)
    }: _*)

  /** P2 + U1 — three heterogeneous branches (customers, parts, orders)
    * harmonized and positionally UNION ALL'd, exactly the reference's
    * 3-branch asset union (generate-asset.scala:274-276).
    */
  val unionHarmonized: Q = (spark, dir) => {
    val custBranch = customer(spark, dir).select(
      lit("customer").as("entity_type"),
      col("c_custkey").as("entity_id"),
      col("c_name").as("entity_name"),
      col("c_mktsegment").as("category"),
      r2(col("c_acctbal")).as("score"),
      (col("c_acctbal") > 0.0).as("flag")
    )
    val partBranch = part(spark, dir).select(
      lit("part").as("entity_type"),
      col("p_partkey").as("entity_id"),
      col("p_name").as("entity_name"),
      col("p_type").as("category"),
      r2(col("p_retailprice")).as("score")
    )
    val orderBranch = orders(spark, dir).select(
      lit("order").as("entity_type"),
      col("o_orderkey").as("entity_id"),
      col("o_orderstatus").as("category"),
      r2(col("o_totalprice")).as("score"),
      col("o_orderdate").as("event_ts")
    )
    harmonize(custBranch)
      .union(harmonize(partBranch))
      .union(harmonize(orderBranch))
      .orderBy(col("entity_type"), col("entity_id"))
  }

  val unionHarmonizedSql: String =
    s"""SELECT * FROM (
      |  SELECT 'customer' AS entity_type, c_custkey AS entity_id, c_name AS entity_name,
      |    c_mktsegment AS category, ${sqlR2("c_acctbal")} AS score,
      |    CAST(NULL AS TIMESTAMP) AS event_ts, c_acctbal > 0.0 AS flag
      |  FROM customer
      |  UNION ALL
      |  SELECT 'part', p_partkey, p_name, p_type, ${sqlR2("p_retailprice")},
      |    CAST(NULL AS TIMESTAMP), CAST(NULL AS BOOLEAN)
      |  FROM part
      |  UNION ALL
      |  SELECT 'order', o_orderkey, CAST(NULL AS VARCHAR), o_orderstatus,
      |    ${sqlR2("o_totalprice")}, o_orderdate, CAST(NULL AS BOOLEAN)
      |  FROM orders)
      |ORDER BY entity_type, entity_id""".stripMargin

  /** intersect / except / distinct — absent from the reference (§2.7) but
    * part of a complete engine: partkeys sold by both suppliers 1 and 2
    * (intersect), and ordered-but-never-shipped-late keys (except).
    */
  val setIntersectExcept: Q = (spark, dir) => {
    val l = lineitem(spark, dir)
    val bySupp1 = l.filter(col("l_suppkey") === 1L).select(col("l_partkey"))
    val bySupp2 = l.filter(col("l_suppkey") === 2L).select(col("l_partkey"))
    val both = bySupp1.intersect(bySupp2).withColumn("set_op", lit("intersect"))
    val only1 = bySupp1.except(bySupp2).withColumn("set_op", lit("except"))
    val dedup = l.filter(col("l_suppkey").isin(1L, 2L))
      .select(col("l_partkey")).distinct().withColumn("set_op", lit("distinct"))
    both.union(only1).union(dedup)
      .select(col("set_op"), col("l_partkey"))
      .orderBy(col("set_op"), col("l_partkey"))
  }

  val setIntersectExceptSql: String =
    """SELECT * FROM (
      |  SELECT 'intersect' AS set_op, l_partkey FROM
      |    (SELECT l_partkey FROM lineitem WHERE l_suppkey = 1
      |     INTERSECT
      |     SELECT l_partkey FROM lineitem WHERE l_suppkey = 2)
      |  UNION ALL
      |  SELECT 'except', l_partkey FROM
      |    (SELECT l_partkey FROM lineitem WHERE l_suppkey = 1
      |     EXCEPT
      |     SELECT l_partkey FROM lineitem WHERE l_suppkey = 2)
      |  UNION ALL
      |  SELECT 'distinct', l_partkey FROM
      |    (SELECT DISTINCT l_partkey FROM lineitem WHERE l_suppkey IN (1, 2)))
      |ORDER BY set_op, l_partkey""".stripMargin

  /** Multiset (ALL) variants — duplicate-preserving set algebra over
    * per-supplier part multisets (intersectAll keeps min multiplicity,
    * exceptAll subtracts multiplicities — same in DuckDB).
    */
  val setAllOps: Q = (spark, dir) => {
    val l = lineitem(spark, dir)
    val s1 = l.filter(col("l_suppkey") === 1L).select(col("l_partkey"))
    val s2 = l.filter(col("l_suppkey") === 2L).select(col("l_partkey"))
    s1.intersectAll(s2).withColumn("set_op", lit("intersect_all"))
      .union(s1.exceptAll(s2).withColumn("set_op", lit("except_all")))
      .select(col("set_op"), col("l_partkey"))
      .orderBy(col("set_op"), col("l_partkey"))
  }

  val setAllOpsSql: String =
    """SELECT * FROM (
      |  SELECT 'intersect_all' AS set_op, l_partkey FROM
      |    (SELECT l_partkey FROM lineitem WHERE l_suppkey = 1
      |     INTERSECT ALL
      |     SELECT l_partkey FROM lineitem WHERE l_suppkey = 2)
      |  UNION ALL
      |  SELECT 'except_all', l_partkey FROM
      |    (SELECT l_partkey FROM lineitem WHERE l_suppkey = 1
      |     EXCEPT ALL
      |     SELECT l_partkey FROM lineitem WHERE l_suppkey = 2))
      |ORDER BY set_op, l_partkey""".stripMargin

  val queries: Map[String, Q] = Map(
    "q_union_harmonized" -> unionHarmonized,
    "q_set_intersect_except" -> setIntersectExcept,
    "q_set_all_ops" -> setAllOps
  )

  val oracles: Map[String, String] = Map(
    "q_union_harmonized" -> unionHarmonizedSql,
    "q_set_intersect_except" -> setIntersectExceptSql,
    "q_set_all_ops" -> setAllOpsSql
  )
}
