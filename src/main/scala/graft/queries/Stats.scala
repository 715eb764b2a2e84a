package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Statistical aggregates — variance / stddev / covariance / correlation
  * and exact interpolated percentiles.
  *
  * The built-in stddev/corr accumulate doubles in partition order, so
  * their last ulp is partitioning-dependent and can never hash-match an
  * oracle. Here the moments (Σx, Σx², Σxy) accumulate in exact decimal
  * (order-free), and the textbook formulas are spelled out identically
  * in both engines — same IEEE ops, bit-identical results. StatsSpec
  * asserts the moment formulation equals the built-ins within tolerance
  * (semantic equivalence), while the oracle asserts bit-equality of the
  * deterministic form.
  */
object Stats {
  import Tables._
  import Det._
  type Q = (SparkSession, String) => DataFrame

  private def dsumSq(c: Column): Column = sum((c * c).cast("decimal(38,8)")).cast("double")

  /** Sample variance / stddev / covariance / correlation of quantity and
    * extended price per return flag, from exact decimal moments.
    */
  val statsMoments: Q = (spark, dir) =>
    lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).cast("double").as("n"),
        dsum(col("l_quantity")).as("sx"),
        dsumSq(col("l_quantity")).as("sxx"),
        dsum(col("l_extendedprice")).as("sy"),
        dsumSq(col("l_extendedprice")).as("syy"),
        sum((col("l_quantity") * col("l_extendedprice")).cast("decimal(38,8)"))
          .cast("double").as("sxy"))
      .select(
        col("l_returnflag"),
        col("n").cast("long").as("line_count"),
        r6((col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - 1.0)).as("var_qty"),
        r6(sqrt((col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - 1.0))).as("stddev_qty"),
        r4((col("sxy") - col("sx") * col("sy") / col("n")) / (col("n") - 1.0)).as("covar_qty_price"),
        r6(((col("sxy") - col("sx") * col("sy") / col("n")) / (col("n") - 1.0)) /
          (sqrt((col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - 1.0)) *
           sqrt((col("syy") - col("sy") * col("sy") / col("n")) / (col("n") - 1.0)))).as("corr_qty_price"))
      .orderBy(col("l_returnflag"))

  val statsMomentsSql: String = {
    def m(e: String) = s"CAST(sum(CAST(($e) AS DECIMAL(38,8))) AS DOUBLE)"
    val n = "CAST(count(*) AS DOUBLE)"
    val varQ = s"((${m("l_quantity * l_quantity")} - ${m("l_quantity")} * ${m("l_quantity")} / $n) / ($n - 1.0))"
    val varP = s"((${m("l_extendedprice * l_extendedprice")} - ${m("l_extendedprice")} * ${m("l_extendedprice")} / $n) / ($n - 1.0))"
    val covar = s"((${m("l_quantity * l_extendedprice")} - ${m("l_quantity")} * ${m("l_extendedprice")} / $n) / ($n - 1.0))"
    s"""SELECT l_returnflag,
       |  count(*) AS line_count,
       |  ${sqlR6(varQ)} AS var_qty,
       |  ${sqlR6(s"sqrt($varQ)")} AS stddev_qty,
       |  ${sqlR4(covar)} AS covar_qty_price,
       |  ${sqlR6(s"$covar / (sqrt($varQ) * sqrt($varP))")} AS corr_qty_price
       |FROM lineitem
       |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
  }

  /** Exact interpolated quartiles of quantity per return flag: Spark's
    * `percentile` and DuckDB's `quantile_cont` both do linear
    * interpolation over the sorted values — identical on these
    * small-integer-valued doubles.
    */
  val percentiles: Q = (spark, dir) =>
    lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_quantity, 0.25)").as("q1"),
        expr("percentile(l_quantity, 0.5)").as("median"),
        expr("percentile(l_quantity, 0.75)").as("q3"),
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty"))
      .orderBy(col("l_returnflag"))

  val percentilesSql: String =
    """SELECT l_returnflag,
      |  quantile_cont(l_quantity, 0.25) AS q1,
      |  quantile_cont(l_quantity, 0.5) AS median,
      |  quantile_cont(l_quantity, 0.75) AS q3,
      |  min(l_quantity) AS min_qty,
      |  max(l_quantity) AS max_qty
      |FROM lineitem
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Fixed-width histogram of order totals: bucket index from portable
    * arithmetic (`floor((x-lo)/step)` clamped — DuckDB 1.0 lacks
    * width_bucket, and the explicit form is engine-identical anyway),
    * with per-bucket count and exact-decimal sum.
    */
  val histogram: Q = (spark, dir) =>
    orders(spark, dir)
      .withColumn("bucket",
        least(greatest(floor((col("o_totalprice") - 0.0) / 60000.0), lit(0.0)), lit(9.0))
          .cast("long"))
      .groupBy(col("bucket"))
      .agg(
        count(lit(1)).as("n_orders"),
        r2(dsum(col("o_totalprice"))).as("bucket_total"),
        r2(min(col("o_totalprice"))).as("bucket_min"),
        r2(max(col("o_totalprice"))).as("bucket_max"))
      .orderBy(col("bucket"))

  val histogramSql: String =
    s"""WITH b AS (
       |  SELECT CAST(least(greatest(floor((o_totalprice - 0.0) / 60000.0), 0.0), 9.0) AS BIGINT)
       |           AS bucket,
       |         o_totalprice
       |  FROM orders)
       |SELECT bucket,
       |  count(*) AS n_orders,
       |  ${sqlR2(sqlDsum("o_totalprice"))} AS bucket_total,
       |  ${sqlR2("min(o_totalprice)")} AS bucket_min,
       |  ${sqlR2("max(o_totalprice)")} AS bucket_max
       |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin

  val queries: Map[String, Q] = Map(
    "q_stats_moments" -> statsMoments,
    "q_percentiles" -> percentiles,
    "q_histogram" -> histogram
  )

  val oracles: Map[String, String] = Map(
    "q_stats_moments" -> statsMomentsSql,
    "q_percentiles" -> percentilesSql,
    "q_histogram" -> histogramSql
  )
}
