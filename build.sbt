ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "bigdataprocessingwithawsglueworkshopspark"
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
// Stream the forked run's stdout directly (no sbt [info] prefix):
// the driver machine-parses Bench's one-line JSON from stdout, and
// the logger wrapper broke that parse in r1 and r2.
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
  // local[32] packs all "executors" into one heap: 8g gave each of the
  // 32 task slots ~250 MB and the sf10 tier spent most of its time
  // spilling, while the oracle engine used the whole 128 GiB box. 48g
  // (~1.5 GB/slot) is still conservative next to any real executor.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
  // Pin the committed heap: with the default small -Xms, G1 uncommits
  // regions after each query and the kernel re-zeroes them on regrowth
  // — profiled as 60%+ SYSTEM time stalls that made identical sf10
  // runs swing 1.4 s ... 8 s. A fixed-size heap faults each page once.
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
  // Fault + zero every heap page at JVM start (untimed) instead of
  // mid-query: lazy first-touch zeroing of a 48g heap showed up as
  // multi-second 60%-sys-time stalls scattered through the first
  // dozen sf10 runs.
  "-XX:+AlwaysPreTouch",
)
