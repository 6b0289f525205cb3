ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "sapctadatapipelinespark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
// 25 suites share one SparkSession (SparkSpec.spark); sbt's default
// parallel suite execution races streaming micro-batch timing tests
// against heavy batch jobs — one observed SourcesSpec flake in ~4 full
// runs. Sequential suites make the gate deterministic.
Test / parallelExecution := false
run / fork := true
// The bench/verify driver parses the forked JVM's stdout line-by-line;
// sbt's default logged output prefixes every line with "[info] ", which
// breaks JSON-line parsing (BENCH_r1..r4 all recorded parsed:null).
// StdoutOutput passes the child's stdout through verbatim.
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
  // 16g, not 8g: the bench is a single local[32] JVM running 214
  // queries back-to-back on a 128 GiB machine; at 8g the heap sits
  // near the GC ceiling once a few hundred dead broadcast/shuffle
  // blocks accumulate, and allocation-heavy queries thrash (round 5:
  // identical code measured 0.6 s in-suite at r4, 19.5 s at r5).
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
) ++
  // Optional scratch-dir override (r22 A/B hook): everything ephemeral
  // (Staging roots, streaming checkpoints, spark.local.dir shuffle
  // files) keys off java.io.tmpdir; SPARK_GRAFT_TMPDIR redirects it
  // (e.g. to a tmpfs) for I/O-layout experiments. Unset = unchanged.
  sys.env.get("SPARK_GRAFT_TMPDIR").map(d => s"-Djava.io.tmpdir=$d").toSeq
