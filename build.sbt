ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "pulsarlunarspark"
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
// Per-test durations in every run (-oD): the suite crossed the ~20 min
// watch line in round 17, and tagging the slow Spark-session-heavy
// specs needs timings in the artifact of record, not a special re-run.
Test / testOptions += Tests.Argument(TestFrameworks.ScalaTest, "-oD")
// The driver captures only the LAST 2000 chars of a run's stdout; sbt's
// "[success] Total time ..." banner printed after graft.Bench's one-line
// JSON ate ~76 chars of that window, truncating the line's head
// (BENCH_r05/r06 both unparseable). Exit status still reports success.
showSuccess := false
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
  // ~80 query keys x (warm-up + timed reps) of whole-stage codegen JIT a
  // lot of generated classes in one JVM. An instrumented sweep
  // (-Xlog:codecache,gc) showed the default 240 MB cache NOT flushing
  // and GC healthy (~1.8 s pauses / 172 s run, zero full GCs), so the
  // cross-round "phantom regression" variance is environmental, not a
  // JVM-resource cliff — headroom here is cheap insurance (virtual
  // memory only), not a measured fix.
  "-XX:ReservedCodeCacheSize=512m",
) ++ sys.env.get("SPARK_GRAFT_EXTRA_JAVA_OPTS").toSeq.flatMap(_.split(" ").filter(_.nonEmpty)) ++
  // forward the suite-depth switch into the forked test JVM:
  // `sbt -Dgraft.soak=full test` = the gate run's full property depth
  sys.props.get("graft.soak").map(v => s"-Dgraft.soak=$v").toSeq
