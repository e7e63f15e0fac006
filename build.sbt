ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "idaiceenergysimulationetlpipelinespark"
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
// No `[success] Total time: …` trailer: the bench driver records only the
// LAST 2000 chars of `sbt "runMain graft.Bench"` stdout and parses the
// final line as JSON — Bench prints its tail-safe headline last, and this
// keeps sbt from printing its own banner after it (the reason every
// BENCH_r{1..8}.json came back `parsed: null`). Success is still signalled
// by the exit code; failures still print `[error]`.
Global / showSuccess := false
// The second half of the tail fix (r10): even with the success banner gone,
// sbt's logger wraps every forked-run stdout line with an `[info] ` prefix,
// so the driver's last-line JSON parse failed for 9 straight rounds
// (`[info] {"metric":…}` is not JSON). StdoutOutput routes the forked
// process's stdout straight through, bypassing the logger and its prefix.
run / outputStrategy := Some(StdoutOutput)
// showSuccess is consumed by sbt's command engine, not a task — lint can't
// see that and would warn "unused" on every invocation
Global / excludeLintKeys += showSuccess
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
