ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "decisionskinesisspark"
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
// The round driver parses the LAST stdout line of `sbt "runMain graft.Bench"`
// as JSON. Two sbt behaviors break that: the "[info] " prefix on forked
// stdout (LoggedOutput) and the trailing "[success] Total time" epilogue.
// StdoutOutput inherits the child's stdout verbatim; showSuccess drops the
// epilogue — so the bench's compact JSON line really is last.
outputStrategy := Some(StdoutOutput)
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
  // 16g default: the typed-aggregation pipelines (simhash/minhash) GC-
  // thrash in 8g at sf0.1; SPARK_DRIVER_MEM still overrides.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  // 136 queries × several whole-stage-codegen classes × 3 bench samples
  // overflow the default 240 MB JIT code cache; once it fills, the JIT
  // disables and alphabetically-late queries run interpreted (measured:
  // s_ann_ivf 0.9 s → 8.3 s median in the full bench but fast in a fresh
  // JVM). Size the cache to the workload like any other memory region.
  "-XX:ReservedCodeCacheSize=1g",
)
