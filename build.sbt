ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "bigdatamlteamrepospark"
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
// Forked run output goes straight to this process's stdout with NO
// "[info] " prefix, so Bench's final JSON line is parseable by the
// driver (BENCH_r01/r02 both had parsed:null from the sbt log prefix).
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
// Pinned JVM sizing (VERDICT r10 item 3): the r10 plan audit measured
// bench totals floating 20-30% with JVM state alone. Fix the levers:
//  - ReservedCodeCacheSize: JDK 17 defaults to 240 MB; 217 queries'
//    whole-stage codegen + JIT output overflows it mid-run, and a full
//    code cache silently stops JIT compilation — a cliff that hits
//    whichever queries run late in the suite.
//  - Xms = Xmx: no heap-growth pauses mid-run; G1 region sizing is
//    fixed from the first query instead of drifting with expansion.
//  - Explicit G1 so the collector never depends on JDK ergonomics.
// HEAP CAP (round 13, closing the r12 "89g stall windows" investigation
// — experiments + mechanism in plans/R13_NOTES.md): the r11/r12 episodic
// multi-second mutator stalls reproduce ONLY at large heaps, and the r13
// probes caught the mechanism in the act — first-touch page faults.
// -Xms commits the heap but the OS (and on shared hosts, the hypervisor)
// materializes pages on FIRST TOUCH; an -XX:+AlwaysPreTouch probe
// measured that materialization at ~55 MB/s on the r13 host (≈27 MINUTES
// for 89 GiB), so every advance of the heap high-water mark strands some
// task in minutes of kernel fault time — episodic, mutator-side, zero GC
// pause, arbitrary victim: exactly the r11 q73/q134 and r12 q206
// signatures. The engine's measured storage peak is ~9 MB and every
// known-good session (r11-r13, spread_max ≤ 0.5s) ran 8g, so heaps
// beyond that only buy fault territory: cap what SPARK_DRIVER_MEM can
// inflate. Experiments can still force a big heap through
// SPARK_GRAFT_EXTRA_JVM (appended last, overrides -Xmx/-Xms).
// Cap comparison is in MiB so m-suffixed requests can't slip through a
// GiB floor-division (e.g. '9215m' ≈ 9.0 GiB used to floor to 8 and
// evade the cap).
val heapCapMib = 8L * 1024
val pinnedMem = {
  val req = sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")
  val mib = "^(\\d+)([gGmM])$".r.findFirstMatchIn(req.trim).map { m =>
    val v = m.group(1).toLong
    if (m.group(2).toLowerCase == "g") v * 1024 else v
  }
  mib match {
    case Some(m) if m > heapCapMib => s"${heapCapMib}m"
    case Some(_)                   => req.trim
    case None                      => s"${heapCapMib}m" // unparseable → proven default
  }
}
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx$pinnedMem",
  s"-Xms$pinnedMem",
  "-XX:ReservedCodeCacheSize=512m",
  "-XX:+UseG1GC",
)
// Experiment-only extra JVM flags (unset in driver runs — appended last
// so they can override the pinned set): the round-12 heap investigation
// (plans/R12_NOTES.md) A/Bs GC logging and sizing flags through this.
javaOptions ++= sys.env.get("SPARK_GRAFT_EXTRA_JVM").toSeq
  .flatMap(_.split("\\s+").filter(_.nonEmpty))
