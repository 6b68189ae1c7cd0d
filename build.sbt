ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "unitdbspark"
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
// Pass the forked program's stdout through RAW instead of re-logging it
// with sbt's "[info] " prefix: the driver captures the stdout tail and
// json-parses lines — every round through r14 the Bench compact line was
// complete in the tail yet recorded "parsed": null, because the prefix
// made the line non-JSON. StdoutOutput is the fix (program stderr passes
// through too, keeping telemetry off stdout). Project-scoped so both
// `run` and `runMain` (and forked tests) resolve it by delegation.
outputStrategy := Some(StdoutOutput)
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
  // Whole-stage codegen emits a fresh class per query plan; a long
  // multi-query run (Bench walks 100+ queries) fills the JVM's default
  // 240 MB code cache, after which HotSpot PERMANENTLY disables the JIT
  // ("CodeCache is full. Compiler has been disabled.") and every later
  // query runs interpreted — measured 10-30x slowdowns that masquerade
  // as data-scale regressions. Reserve enough that the compiler never
  // turns off (virtual reservation; committed on demand).
  "-XX:ReservedCodeCacheSize=1g",
)
