ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "graphchicppspark"
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
// Default heap: 64g on a big box (the 128 GiB bench host), otherwise
// half of physical RAM — a hard-coded -Xms64g fails to start (or gets
// OOM-killed under strict overcommit) on smaller machines. Physical RAM
// read from /proc/meminfo; SPARK_DRIVER_MEM always wins.
val defaultHeap: String = {
  val memGb: Long = try {
    val src = scala.io.Source.fromFile("/proc/meminfo")
    try src.getLines().collectFirst {
      case l if l.startsWith("MemTotal:") =>
        l.split("\\s+")(1).toLong / (1024L * 1024L)
    }.getOrElse(0L)
    finally src.close()
  } catch { case _: Throwable => 0L }
  if (memGb >= 96) "64g"
  else if (memGb > 0) s"${math.max(2L, memGb / 2)}g"
  else "8g"
}
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 32 local cores share one heap: localCheckpoint blocks + 32 in-flight
  // tasks need far more than the JVM default on the 128 GiB bench box.
  // 32g measurably GC-throttles the post-query-suite throughput probe
  // (22s → 95s for the same run); 64g leaves headroom on the bench box.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", defaultHeap)}",
  // Fixed-size heap: without -Xms the JVM starts at ~2g and G1 grows
  // the heap through repeated full GCs under Spark's allocation rate —
  // r7 measured 123 full GCs in one bench run and a triangle probe at
  // 100 s that dropped to 30 s with the heap pre-sized.
  // SPARK_GRAFT_XMS overrides just the initial size for A/B runs.
  s"-Xms${sys.env.getOrElse("SPARK_GRAFT_XMS",
    sys.env.getOrElse("SPARK_DRIVER_MEM", defaultHeap))}",
  // More C2 threads: Spark codegen makes every first-of-its-shape query
  // JIT-bound (r7 GRAFT_DEBUG: q53 carried +47 s of compiler-thread
  // time); the box has 32 cores and compilation overlaps execution, so
  // widening the compiler pool shortens the slow interpreted phase.
  "-XX:CICompilerCount=12",
) ++ (
  // Pre-touch the whole heap at JVM start (skippable for quick local
  // iteration via SPARK_GRAFT_NO_PRETOUCH=1). -Xms=-Xmx COMMITS the
  // heap but does not TOUCH it, and on this microVM host first-touch
  // of a page costs ~45 us of kernel/VMM CPU charged to the faulting
  // TASK thread (host-side demand paging) — the root cause of the
  // r8-r10 "repeat-run anomaly": G1 allocates regions lazily, so the
  // SECOND heavy run swept past run 1's high-water mark into untouched
  // address space and burned 100-300 s of pure fault CPU inside
  // ordinary array code (measured: the anomalous run carries 7.35M
  // minor faults vs 0.5M, and with pre-touch faults drop to ~20k, the
  // anomaly disappears, and steady-state runs get ~2x faster because
  // even "good" runs were paying fault tax). Cost (re-measured r12,
  // `time java -Xms64g -Xmx64g -XX:+AlwaysPreTouch -version`): the
  // pre-touch pass is PARALLEL over the 23 default ParallelGCThreads —
  // ~20-30 s wall typical for 64g (2.5-10 min of sys CPU), ~90 s in a
  // contended host window; r11's "6.5 min" figure is the
  // single-threaded cost (-XX:ParallelGCThreads=1 reproduces it at
  // 6m56s) and was a mis-measurement of the default path. More threads
  // do NOT help (32 threads: 38 min sys CPU — host fault-path
  // contention is superlinear) and -XX:+UseTransparentHugePages is
  // pathological here (43 min sys CPU: host-side 2M allocation), so
  // the default thread count stays. All of it is OFF every timed
  // region. See FM_INFLATION_ANALYSIS.md r11 addendum.
  // Truthy opt-out only (r11 ADVICE): SPARK_GRAFT_NO_PRETOUCH=0 or
  // empty keeps pre-touch ON — a presence-only check made =0 disable it.
  if (sys.env.get("SPARK_GRAFT_NO_PRETOUCH")
        .exists(v => v.nonEmpty && v != "0" && v != "false"))
    Seq.empty[String]
  else Seq("-XX:+AlwaysPreTouch")
) ++ sys.env.get("SPARK_GRAFT_JVM_OPTS").toSeq.flatMap(_.split("\\s+").toSeq)
// Tests run tiny in-memory fixtures: a 64g pre-touched heap buys them
// nothing and costs ~30 s of pre-touch fault tax per forked test JVM
// (plus 64 GiB of host commit). 16g keeps every spec comfortable while
// cutting the pre-touch pass to a few seconds; SPARK_DRIVER_MEM still
// wins for A/B runs. Bench/Verify/ScaleBench (run config) keep the
// full-size heap above.
Test / javaOptions := {
  val heap = sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")
  (Test / javaOptions).value
    .filterNot(o => o.startsWith("-Xmx") || o.startsWith("-Xms")) ++
    Seq(s"-Xmx$heap", s"-Xms${sys.env.getOrElse("SPARK_GRAFT_XMS", heap)}")
}
