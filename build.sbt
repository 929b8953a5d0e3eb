ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "stormbenchspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
// Forked `run` output must reach stdout RAW (no sbt "[info] " prefix):
// the bench/verify drivers parse the JSON result line from stdout.
run / outputStrategy := Some(StdoutOutput)
Compile / run / outputStrategy := Some(StdoutOutput)
// suites share one local SparkContext; parallel suites race on the
// active/default SparkSession (breaks extension registration tests)
Test / parallelExecution := false
run / fork := true
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
  // Whole-stage-codegen classes retained by the (raised, see
  // Bench/Verify builders) generated-code cache are JIT-compiled hot;
  // the JVM default 240m code cache overflows on a many-hundred-plan
  // service and HotSpot then DISABLES compilation — measured as a
  // uniform tail slowdown. Reservation is address space, committed
  // lazily, so the larger bound costs nothing when unused.
  s"-XX:ReservedCodeCacheSize=${sys.env.getOrElse("SPARK_GRAFT_CODE_CACHE", "1g")}",
) ++ sys.env.get("SPARK_GRAFT_JVM_PROPS")
  .map(_.split(' ').toSeq.filter(_.nonEmpty)).getOrElse(Seq())
