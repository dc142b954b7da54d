ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "phpecspark"
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
// Pipe the forked run's stdout/stderr straight through instead of
// re-logging each line with an `[info] `/`[error] ` prefix: the driver
// machinery that consumes the bench's stdout JSON lines parses them
// per-line, and a prefixed line is not valid JSON (every BENCH_r*.json
// since r01 carries `parsed: null` — including r01, whose complete
// contract-format line sat inside the captured tail, so the prefix is
// the remaining explanation). Raw pass-through makes each emitted
// `{"metric":...}` line machine-parsable as-is; human greps
// (`grep '"metric"'`) are unaffected.
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
  // 8g measured best for the bench at local[32]/sf0.1: a larger heap
  // (24g tried) makes G1 pauses and allocation noise visibly worse
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
