ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "gpqspark"
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
// The external driver stores the final 2000 chars of `sbt runMain
// graft.Bench` STDOUT and JSON-parses them for the one-line bench
// artifact. sbt decorated the forked run's stdout to "[info] {…}" and
// appended its own "[success] Total time: …" line AFTER it, so the
// driver's parse failed every round (BENCH_r01..r14 all carry
// "parsed": null). StdoutOutput passes the forked JVM's stdout through
// undecorated; showSuccess drops the trailing [success] line, so the
// bench's compact JSON line is the LAST thing on stdout. Scoped to
// `run` — test output keeps its [info] framing.
run / outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
// showSuccess is consumed by sbt's command engine, not by a task, which
// trips the unused-key lint
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
  // local mode = driver-only JVM; the box has 128 GiB and local[32]
  // runs 32 task threads, so a small heap just converts memory into GC
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
