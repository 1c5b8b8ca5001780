ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
// The bench driver scrapes only the last ~2000 chars of stdout for the
// one-line JSON contract; sbt's trailing "[success] Total time: ..."
// line sits between the JSON and EOF and has eaten ~75 chars of that
// window every round. Suppress it so the bench's compact contract line
// is the final stdout line.
Global / showSuccess := false
Global / excludeLintKeys += showSuccess
// Pass the forked run's stdout through RAW: sbt's default LoggedOutput
// prefixes every line with "[info] " (and the child's stderr with
// "[error] ", ONTO STDOUT), which both corrupts the bench's one-line
// JSON contract for a strict parser and stuffs Spark logs into the
// driver's stdout capture window.
run / outputStrategy := Some(StdoutOutput)
name := "yelp_recommenderspark"
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
  // JDK 17 reserves only 240 MiB of JIT code cache; a ~300-gate
  // whole-stage-codegen suite in ONE JVM generates enough unique
  // compiled methods to fill it, after which UseCodeCacheFlushing
  // keeps the JVM alive by evicting hot methods — which then
  // recompile, inflating cpu_s/wall on UNCHANGED queries (the round-8
  // driver-bench regression: q151 12.5→48.6 s with flat GC). 1 GiB is
  // reserved address space, not committed memory, so it costs nothing
  // until used. Override with SPARK_CODE_CACHE for A/B measurement.
  s"-XX:ReservedCodeCacheSize=${sys.env.getOrElse("SPARK_CODE_CACHE", "1g")}",
)
