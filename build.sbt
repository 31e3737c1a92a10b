ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
// sources carry UTF-8 literals (mojibake fixtures, docs) — pin the
// compiler charset rather than trusting the platform default (the
// container JVM default is ASCII when LANG is unset)
ThisBuild / scalacOptions ++= Seq("-encoding", "utf8")
name := "basisdevkitspark"
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
// The bench driver machine-parses the LAST line of `sbt runMain` stdout.
// StdoutOutput forwards the forked JVM's stdout unprefixed (no `[info] `),
// and showSuccess drops the trailing `[success] Total time…` line, so the
// bench's single JSON line really is the bare final stdout line.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
showSuccess := false
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
  // At 32 threads the parquet snappy path holds JNI critical sections
  // (GCLocker) while shuffle sorters make humongous (>half-region)
  // pointer-array allocations; with the JDK default of 2 retries an
  // allocation can spuriously OOM while memory is reclaimable
  // ("Retried waiting for GCLocker too often", hit by the round-13
  // 1000x probe on a 600M-row shuffle at 8g). Raising the retry count
  // is the documented mitigation (JDK-8192647).
  "-XX:+UnlockDiagnosticVMOptions", "-XX:GCLockerRetryAllocationCount=64",
)
