ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "quantitativedatabaseandvisualizationplatformspark"
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
// Pass the forked JVM's stdout through verbatim: the driver parses the
// ONE JSON line Bench/Verify print, and sbt's default LoggedOutput
// prefixes every line with "[info] ", which breaks json.loads on the
// driver side (observed: BENCH parsed=null in every round 1-7).
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
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // Catalyst analysis recurses once per projection level; the
  // ~200-intermediate Alpha101 plan needs more than the 1m default.
  "-Xss64m",
  // The ~500-projection alpha DAG (plus codegen.cache.maxEntries=5000)
  // overflows the default ~240 MB reserved code cache — the JVM then
  // prints "CodeHeap 'non-profiled nmethods' is full" and DISABLES the
  // JIT, so the q90/q58 tail runs interpreted. 512m still filled its
  // non-profiled segment during the full 80-entry bench sweep
  // (r9 run: warning at t=401s, inside q90); 1g keeps the JIT alive
  // end to end. Reserved (virtual) only — committed on demand.
  "-XX:ReservedCodeCacheSize=1g",
  "-XX:+UseCodeCacheFlushing",
) ++ sys.env.get("GRAFT_JAVA_OPTS").toSeq.flatMap(_.split("\\s+").filter(_.nonEmpty))
