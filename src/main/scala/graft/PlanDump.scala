package graft
import java.nio.file.{Files, Paths}

/** Round-15 measurement tool: dump `.explain("formatted")` for declared
  * queries to plans/<tag>/<name>_<suffix>.txt. Warm-plan discipline: each
  * query is materialized once (count) so session memos exist, then the
  * FRAME IS REBUILT and the rebuilt plan is captured — the steady-state
  * plan a bench run 2..n executes, not the cold build.
  *
  * Usage: runMain graft.PlanDump <sfDir> <outDir> <suffix> [namePrefix...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val prefixes = args.drop(3).toSeq
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
    Files.createDirectories(Paths.get(outDir))
    val sweep = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => prefixes.isEmpty || prefixes.exists(n.startsWith) }
    var prevFamily: String = null
    def family(name: String): String = name.split("_").take(2).mkString("_")
    sweep.foreach { case (name, fn) =>
      if (prevFamily != null && family(name) != prevFamily)
        graft.queries.Det.releasePins(spark)
      prevFamily = family(name)
      try {
        fn(spark, sfDir).count() // warm memos
        val plan = fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.write(Paths.get(outDir, s"${name}_$suffix.txt"),
          plan.getBytes("UTF-8"))
        println(s"[plandump] $name ok")
      } catch { case e: Throwable =>
        println(s"[plandump] $name FAILED: $e")
      }
    }
    graft.queries.Det.releasePins(spark)
    spark.stop()
  }
}
