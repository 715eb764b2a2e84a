package graft

import org.apache.spark.sql.functions._

/** The deterministic moment formulation (queries.Stats) is semantically
  * the same statistic as Spark's built-in var_samp/stddev/corr — equal
  * within floating tolerance (the built-ins are order-dependent in the
  * last ulp, which is exactly why the oracle-verified form uses exact
  * decimal moments instead).
  */
class StatsSpec extends SparkSpec {

  test("moment-form variance/stddev/corr match built-ins within tolerance") {
    val dir = "/root/testdata/sf0.001"
    val ours = graft.queries.Stats.statsMoments(spark, dir)
      .select("l_returnflag", "var_qty", "stddev_qty", "corr_qty_price")
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val builtin = Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(var_samp(col("l_quantity")).as("v"),
        stddev_samp(col("l_quantity")).as("s"),
        corr(col("l_quantity"), col("l_extendedprice")).as("c"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    for ((flag, (v, s, c)) <- ours) {
      val (bv, bs, bc) = builtin(flag)
      assert(math.abs(v - bv) / bv < 1e-6, s"$flag var $v vs $bv")
      assert(math.abs(s - bs) / bs < 1e-6, s"$flag stddev $s vs $bs")
      assert(math.abs(c - bc) < 1e-6, s"$flag corr $c vs $bc")
    }
  }
}
