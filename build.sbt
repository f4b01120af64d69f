ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "heraclesspark"
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
// The driver parses graft.Bench's final stdout line as JSON. sbt's
// default BufferedOutput decorates every forked-stdout line with
// "[info] " and appends a "[success] Total time…" footer — both defeat
// the parse (BENCH_r11 parsed=null on an otherwise-complete line).
// StdoutOutput makes the forked JVM inherit stdout undecorated;
// showSuccess drops the footer, so the JSON line is last.
run / outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
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
  // Sized to the bench box (125 GiB): at 8g the full 216-query board
  // ran GC-throttled — 165 s total vs 104 s at 16g, with random
  // queries inflated 5-8x by collector debt from earlier queries.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  // Collector choice is measurable on the bench: heavy stages carried
  // 0.5-0.8 s of G1 pause debt (Prof gc_ms column). Env-overridable
  // for A/B (SPARK_GRAFT_GC=UseG1GC to compare).
  s"-XX:+${sys.env.getOrElse("SPARK_GRAFT_GC", "UseParallelGC")}",
)
