ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "deltacatspark"
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
// Driver-parseable bench channel (round-15): the driver captures stdout's
// tail and json-parses the FINAL line. Two pieces of sbt framing defeated
// that for four rounds: the logger prefixes forked run output with
// "[info] ", and the command engine appends "[success] Total time: …"
// after it. StdoutOutput passes the forked JVM's stdout through verbatim;
// showSuccess drops the trailing banner, so the bench's compact JSON
// summary is genuinely the last line of the capture.
outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
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
  // local[32] runs 32 concurrent tasks in ONE JVM: 8g thrashes GC on the
  // shuffle/persist-heavy dedup + pipeline benches (measured 2-3x run-to-run
  // variance); the image has 128 GiB, so give the single-JVM "cluster" a
  // realistic per-core share.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
  // Round-11 (t41_span_removal_10x variance): under default G1, identical
  // back-to-back runs of the allocation-heavy span-hash stream swung
  // 4.5-19 s (one bench artifact hit 41 s) — zero spill, stage count
  // constant, the excursions land exactly when a G1 concurrent cycle's
  // mark threads compete with 32 task threads on the grown heap.
  // ParallelGC (throughput collector; batch workload, nobody cares about
  // pause times here) measured 3.1-5.7 s across the same 5-run probe.
  // Round-12: selectable via SPARK_GRAFT_GC for controlled collector
  // matrices (parallel | g1 | g1conc4); the default stays ParallelGC.
) ++ (sys.env.getOrElse("SPARK_GRAFT_GC", "parallel") match {
  case "g1" => Seq("-XX:+UseG1GC")
  case "g1conc4" => Seq("-XX:+UseG1GC", "-XX:ConcGCThreads=4")
  case _ => Seq("-XX:+UseParallelGC")
})
