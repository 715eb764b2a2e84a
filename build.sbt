ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "demoetlspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// The harness driver tails `sbt "runMain graft.Bench"` stdout for ONE bare
// JSON line; sbt's default logger prefixes forked-process output with
// "[info] ", which breaks the driver's parse (BENCH_r05..r07 parsed:null).
// StdoutOutput inherits the forked JVM's stdio so the line lands unprefixed.
run / outputStrategy := Some(StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 16g on a 128GiB host. At 8g, r7 sweeps under external load showed
  // occasional wall+CPU storms on unchanged sub-second queries (40
  // CPU-seconds on a join that is healthy isolated) — GC-pressure-
  // shaped, so give the sweep headroom; the host's contention bursts
  // made a controlled A/B impossible (see NOTES.md r7 environment).
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)

// Per-test durations in the CI log (r16): the suite's time budget is a
// hard driver gate — with durations recorded, the next slow-creeping
// test is identified from the log instead of by bisection.
Test / testOptions += Tests.Argument("-oD")
