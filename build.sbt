ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "hbsir_oldspark"
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
// The driver invokes `sbt "runMain graft.Bench"` and parses the LAST
// stdout line as JSON. sbt's default LoggedOutput strategy relays the
// forked JVM's stdout through the `[info]`-prefixed logger, which broke
// that parse in every round (BENCH_r01..r18 all record parsed=null).
// StdoutOutput inherits the forked process's streams verbatim (bench
// JSON reaches stdout bare; Spark logs stay on stderr), and
// showSuccess=false drops the trailing "[success] Total time" line so
// the bench's compact JSON stays the final stdout line.
outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
// showSuccess is consumed by sbt's command layer, which the unused-key
// lint cannot see — exclude it (the suppressed "[success] Total time"
// line is observably gone from batch runs)
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
  // 16g default: the round-12 sf1 probe showed the 71-query bench fleet
  // GC-thrashing late in the run at 8g against a 10x working set
  // (155s outliers on a 6s query); the box has 128 GiB
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
