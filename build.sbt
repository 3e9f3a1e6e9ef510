ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "projectbigdatarecsysspark"
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
// Forked run output goes straight to the real stdout/stderr instead of
// through sbt's logger — harness tooling parses Bench's one-line JSON
// from stdout, and the logger's "[info] " prefix breaks that.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  // the default 100-entry codegen class cache thrashes across a
  // 21-query bench suite (LRU evicts every plan between reps; q85's
  // 5-iteration loop then re-Janino-compiles each rep — measured 2×
  // suite-vs-standalone on q85 with heap ruled out); static SQL conf,
  // must be set before the first SparkSession
  "-Dspark.sql.codegen.cache.maxEntries=5000",
  // 24g on the 128 GiB box: at 8g the unified memory pool (~4.6 GiB)
  // forced the persisted dedup caches, q85's localCheckpoint blocks and
  // execution memory to contend — the round-4 driver bench showed the
  // memory-heavy queries (q65/q66/q85) 1.9-2.7× over their anchors
  // while everything else stayed within noise. Headroom removes the
  // whole contention class instead of hand-ordering the suite.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
