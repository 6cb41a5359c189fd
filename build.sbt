ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "vectormcpspark"
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
// Pass the forked process's stdout through UNPREFIXED: the driver parses
// Bench's one-line JSON from sbt's output, and the default LoggedOutput
// strategy wraps every line in "[info] " which breaks JSON parsing
// (BENCH_r01/r02 both recorded "parsed": null).
Compile / run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
// local[32] runs 32 concurrent tasks in ONE JVM: at 8g the sort/agg
// buffers of wide aggregations spill, and under machine contention the
// spill path is what blows bench times up. Default to a quarter of the
// box's RAM capped at 32g (→ 32g on the 128 GiB bench box, small enough
// to start on dev laptops); SPARK_DRIVER_MEM overrides explicitly.
val defaultHeap: String = {
  val memTotalGb =
    try {
      scala.io.Source.fromFile("/proc/meminfo").getLines()
        .collectFirst { case l if l.startsWith("MemTotal:") =>
          l.split("\\s+")(1).toLong / (1024 * 1024) }
        .getOrElse(16L)
    } catch { case _: Throwable => 16L }
  s"${math.max(2L, math.min(32L, memTotalGb / 4))}g"
}
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", defaultHeap)}",
)
