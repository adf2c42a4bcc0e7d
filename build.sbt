ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "knnusinghadoopspark"
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
// The round driver parses the LAST stdout line of `sbt runMain
// graft.Bench` as the bench JSON record. Two sbt behaviors defeat that
// with default settings (observed in BENCH_r01..r08: "parsed": null):
// the forked JVM's stdout is re-logged with an "[info] " prefix, and an
// "[success] Total time: …" banner prints AFTER the JSON line. Forward
// forked output verbatim and drop the banner so the compact bench line
// is the literal final stdout bytes.
outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
// showSuccess is consumed by sbt's command engine, not a task — exclude
// it from the unused-key lint (the lint's own suggestion)
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
  // local mode = driver-only JVM; the box has 128 GiB and sf0.1 bench
  // accumulates broadcasts across 28 queries — 8g thrashes GC
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // dozens of queries × whole-stage codegen classes overflow the
  // default 240m code cache mid-benchmark; once full the JIT stops
  // compiling and interpreted-lambda-heavy queries degrade 5-10x
  "-XX:ReservedCodeCacheSize=1g",
)
