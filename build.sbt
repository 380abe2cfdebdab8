ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "harmoniccentralityspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
// Unscoped on purpose: `runMain` does NOT delegate to task-scoped
// `run / fork`, and the driver may invoke either entrypoint.
fork := true
Test / fork := true
// CRITICAL driver contract: Bench prints ONE bare JSON line on stdout. The
// default LoggedOutput strategy re-emits the forked process's stdout as
// "[info] {...}" which the driver's JSON scan cannot parse (round-1
// BENCH_r01.json: parsed=null). StdoutOutput passes it through verbatim.
outputStrategy := Some(StdoutOutput)
run / outputStrategy := Some(StdoutOutput)
Compile / run / outputStrategy := Some(StdoutOutput)
Compile / runMain / outputStrategy := Some(StdoutOutput)
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
javaOptions ++= sys.env.get("GRAFT_EXTRA_JVM_OPTS").toSeq.flatMap(_.split("\\s+").filter(_.nonEmpty)) ++
  jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // Shuffle + checkpoint spill on this box's ext4 root (mounted `discard`)
  // serializes in the block layer: every superstep creates+deletes thousands
  // of shuffle files and the TRIM/journal traffic is single-lane — profiled
  // as >90% system time with core count making NO difference. tmpfs makes
  // shuffle I/O memory-speed; the box has 126 GiB of it.
  s"-Dspark.local.dir=${sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/graft-spark-local")}",
  // local[32] with GB-scale shuffles + per-iteration localCheckpoint state
  // GC-thrashes in a small heap (32 threads' working set is ~4x of 8
  // threads'); the box has 128 GiB. Same heap at BOTH scaling-leg core
  // counts — only parallelism varies. Xms=Xmx + AlwaysPreTouch: profiling
  // showed >90% SYSTEM time at local[32] — kernel page-fault/zeroing storms
  // from the heap being committed/uncommitted under allocation churn; pinning
  // and pre-faulting the heap keeps the hot path in user space.
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", graftDefaultHeap)}",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", graftDefaultHeap)}",
  "-XX:+AlwaysPreTouch",
)
// Default heap: min(32g, half of physical RAM) so the pinned/pre-touched
// heap never fails JVM startup on a smaller host; SPARK_DRIVER_MEM overrides.
lazy val graftDefaultHeap: String = {
  val memKb =
    try scala.io.Source.fromFile("/proc/meminfo").getLines()
      .collectFirst { case l if l.startsWith("MemTotal:") => l.split("\\s+")(1).toLong }
      .getOrElse(64L * 1024 * 1024)
    catch { case _: Throwable => 64L * 1024 * 1024 }
  s"${math.max(2L, math.min(32L, memKb / (2 * 1024 * 1024)))}g"
}
