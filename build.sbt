ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "icebergpocspark"
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
// The round driver captures a bounded stdout TAIL of `sbt runMain
// graft.Bench` and tries to parse the final JSON line. Two pieces of
// sbt chrome have broken that parse every round so far: the logger's
// "[info] " prefix on forked output (json.loads rejects the line) and
// the trailing "[success] Total time: ..." banner (a non-JSON final
// line). Pass forked stdout through verbatim and drop the banner so
// the process's LAST line is Bench's machine-readable summary.
run / outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
Global / showTiming := false
Global / excludeLintKeys ++=
  Set(run / outputStrategy, showSuccess, showTiming)
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
  // Many janino-codegen'd stages fill the default 240m code cache over a
  // long session; once full, JIT stops and late class inits (e.g. Spark 4's
  // CollationAwareUTF8String ICU tables) run interpreted at 100x cost.
  "-XX:ReservedCodeCacheSize=512m",
)
