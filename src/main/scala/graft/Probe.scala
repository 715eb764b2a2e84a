package graft

/** Scratch profiler for round-15 (not part of the driver contract):
  * times labelled sub-pieces of a hot query after warming family memos.
  */
object Probe {
  def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[probe] $label%-40s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.queries.Similarity
    import org.apache.spark.sql.functions._
    // Warm the family memos like a bench run 1.
    def cpu(): Double = java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
      case b: com.sun.management.OperatingSystemMXBean => b.getProcessCpuTime / 1e9
      case _ => -1.0
    }
    def tc[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val c0 = cpu()
      val r = f
      println(f"[probe] $label%-40s ${(System.nanoTime() - t0) / 1e9}%.3f s  cpu ${cpu() - c0}%.1f")
      r
    }
    @volatile var listen = false
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        if (listen) {
          val si = sc.stageInfo
          println(f"[stage] id=${si.stageId}%-5d tasks=${si.numTasks}%-4d " +
            f"runTimeMs=${si.taskMetrics.executorRunTime}%-7d cpuMs=${si.taskMetrics.executorCpuTime / 1000000}%-7d ${si.name.take(80)}")
        }
    })
    val q = sys.env.getOrElse("PROBE_Q", "q_source_overlap")
    tc(s"$q run1")(SparkEntry.queries(q)(spark, dir).count())
    tc(s"$q run2")(SparkEntry.queries(q)(spark, dir).count())
    listen = true
    tc(s"$q run3")(SparkEntry.queries(q)(spark, dir).count())
    Thread.sleep(500)
    spark.stop()
  }
}
