ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "eventstreamaggrspark"
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
// Bench/Verify output must reach the driver's log tail as BARE stdout
// lines: sbt's default forked-output strategy routes program stdout
// through its logger, prefixing every line with "[info] " — which is what
// kept BENCH_r{9,10,11}.json at "parsed": null even once the line fit the
// tail window (a JSON parser that requires the line to start with '{'
// fails on the prefix). StdoutOutput makes forked program stdout bypass
// the logger entirely.
outputStrategy := Some(StdoutOutput)
// (lintUnused can't see through the forkOptions wiring — verified live:
// with this setting the forked line is bare, without it "[info] "-prefixed)
Global / excludeLintKeys += outputStrategy
// ...and suppress sbt's "[success] Total time: …" footer so a
// last-line-of-output extraction rule lands on the program's JSON line,
// not on sbt bookkeeping.
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // forked tests/mains resolve repo-relative paths (e.g. the committed
  // migration-fixture dir) against this, not the process CWD — running
  // sbt from outside the repo root must not break them
  s"-Dgraft.repoRoot=${baseDirectory.value}",
)
