package graft

/** Scratch r16 microbenchmark (not part of the driver contract):
  * isolate the per-scan cost of a staged lineitem (localCheckpoint row
  * RDD vs columnar cache vs raw parquet) under the top_supplier-shaped
  * filter+aggregate.
  */
object Probe2 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    def cpu(): Double = java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
      case b: com.sun.management.OperatingSystemMXBean => b.getProcessCpuTime / 1e9
      case _ => -1.0
    }
    def tc[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val c0 = cpu()
      val r = f
      println(f"[probe2] $label%-40s ${(System.nanoTime() - t0) / 1e9}%.3f s  cpu ${cpu() - c0}%.1f")
      r
    }
    val cols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
      "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus",
      "l_shipdate").map(col)
    val raw = Tables.lineitem(spark, dir).select(cols: _*)
    def body(d: org.apache.spark.sql.DataFrame) = d
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp_ntz"))
      .groupBy(col("l_suppkey"))
      .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast("decimal(28,8)")))
      .count()
    tc("parquet warmup")(body(raw))
    (1 to 3).foreach(i => tc(s"parquet body $i")(body(raw)))
    val ck = tc("localCheckpoint build")(raw.repartition(32, col("l_orderkey")).localCheckpoint())
    (1 to 3).foreach(i => tc(s"ckpt body $i")(body(ck)))
    val ck1 = tc("ckpt narrow build")(raw.select(col("l_suppkey"), col("l_extendedprice"),
      col("l_discount"), col("l_shipdate")).repartition(32, col("l_orderkey")).localCheckpoint())
    (1 to 3).foreach(i => tc(s"ckpt narrow body $i")(body(ck1)))
    val ca = tc("cache build")({ val c = raw.repartition(32, col("l_orderkey")).cache(); c.count(); c })
    (1 to 3).foreach(i => tc(s"cache body $i")(body(ca)))
    spark.stop()
  }
}
