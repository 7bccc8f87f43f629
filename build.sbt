ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "concertsetlsaspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
// -oD: per-test durations in the report — the data the <6 min default
// suite budget (VERDICT r16 #7) is managed against.
Test / testOptions += Tests.Argument(TestFrameworks.ScalaTest, "-oD")
run / fork := true
// Forked `run` output must reach stdout UNPREFIXED: the bench/verify
// harness parses the JSON result line, and sbt's default logger
// prepends "[info] " to every line.
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
  "-Dfile.encoding=UTF-8",
  "-Dstdout.encoding=UTF-8",
  "-Dstderr.encoding=UTF-8",
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 48g default (box has 128 GiB): headroom for the biggest-data rows
  // (5M-pair verifies, versioned-bundle writers) in a 200-query
  // single-JVM bench session. NOTE the round-15 investigation of
  // in-session q201 inflation ultimately traced the noise to host-level
  // CPU steal (microVM co-tenant; loadavg 15+ with zero local CPU
  // consumers), not heap — the bump is kept as cheap insurance, not as
  // a proven fix. The cal probes in Bench remain the trust signal.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
)
