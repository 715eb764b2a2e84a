package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the union of all operator modules; every entry with a
  * DuckDB-expressible semantics also appears in `oracleSql` with IDENTICAL
  * output column names and a canonical ORDER BY (the driver's compare
  * sorts columns by name, then hashes values).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Customer analytics (SURVEY.md §7.2) — scan, broadcast join, hash agg,
    * distinct agg, conditional sums, derived metrics, canonical sort.
    */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.Core.aggCustomer(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Core.queries ++
      graft.queries.Joins.queries ++
      graft.queries.Windows.queries ++
      graft.queries.SetOps.queries ++
      graft.queries.TextOps.queries ++
      graft.queries.Dedup.queries ++
      graft.queries.Similarity.queries ++
      graft.queries.Events.queries ++
      graft.queries.Media.queries ++
      graft.queries.Grouping.queries ++
      graft.queries.Scalars.queries ++
      graft.queries.Temporal.queries ++
      graft.queries.Subqueries.queries ++
      graft.queries.Stats.queries ++
      graft.queries.Classic.queries ++
      graft.queries.Nested.queries ++
      graft.queries.Sampling.queries ++
      graft.queries.Sketch.queries ++
      graft.queries.Layout.queries ++
      graft.ext.AnnIndex.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    graft.queries.Core.oracles ++
      graft.queries.Joins.oracles ++
      graft.queries.Windows.oracles ++
      graft.queries.SetOps.oracles ++
      graft.queries.TextOps.oracles ++
      graft.queries.Dedup.oracles ++
      graft.queries.Similarity.oracles ++
      graft.queries.Events.oracles ++
      graft.queries.Media.oracles ++
      graft.queries.Grouping.oracles ++
      graft.queries.Scalars.oracles ++
      graft.queries.Temporal.oracles ++
      graft.queries.Subqueries.oracles ++
      graft.queries.Stats.oracles ++
      graft.queries.Classic.oracles ++
      graft.queries.Nested.oracles ++
      graft.queries.Sampling.oracles ++
      graft.queries.Sketch.oracles ++
      graft.queries.Layout.oracles ++
      graft.ext.AnnIndex.oracles
}
