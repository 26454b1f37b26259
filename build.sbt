ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "finiextestingidespark"
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
// Pass the forked run's stdout through verbatim (no "[info] " prefix) so
// line-parsers can read Bench's single JSON line directly from the log.
run / outputStrategy := Some(sbt.StdoutOutput)
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
  // 32 local executor threads share this heap; 8g causes GC churn on the
  // hash-heavy dedup/similarity stages, 16g keeps full-bench GC <2%.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  // -Xms = -Xmx: without it a FRESH JVM starts at G1's tiny default
  // initial heap and measures the whole ramp as young-gen GC — q91's
  // task-summed GC read 441 s/run on a fresh JVM vs 2.4 s/run late in a
  // long-lived suite JVM, identical bytes — which masqueraded as host
  // weather in standalone ladder witnesses.
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
