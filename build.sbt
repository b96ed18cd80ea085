ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "url_counter_mapreducespark"
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
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // Heap default MEASURED, not assumed (round 17): 8g looks GC-bound on
  // short hash/codec subsets (a 24g A/B ran those -11%), but over the
  // FULL 280-query session a 24g heap is 20% SLOWER end to end
  // (166 vs 136-146 s) — with a large heap the collector lets garbage
  // and dropped localCheckpoint blocks pile up across queries, and the
  // eventual pauses land mid-micro-batch (stream_join 1.9 -> 6.4 s,
  // corpus scalars +0.8 s each). The small heap keeps collections short
  // and frequent, which is what a many-short-queries session wants.
  // Override per deployment via SPARK_DRIVER_MEM.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // Spark codegen churns through many generated classes per query; the
  // default 240m code cache can fill over a 30-query session and degrade
  // the JIT (observed as transient 10-100s whole-JVM slowdowns).
  "-XX:ReservedCodeCacheSize=512m",
  // The dynamic compiler-thread heuristic (default on) kills and respawns
  // C1/C2 threads under bursty load — a multi-query session surges new
  // generated classes per query, the pool thrashes, the compile queue
  // backs up, and whole stages run interpreted for 30-100s (thread dumps
  // showed compiler threads with elapsed=1-10s while hot generated
  // iterators sat uncompiled). A fixed pool removes the pathology.
  "-XX:-UseDynamicNumberOfCompilerThreads",
  // Bound time-to-safepoint: generated loops with heavy per-row bodies
  // (md5, regex) at the default 1000-iteration strip length held off
  // safepoint polls for up to 2s, serializing GC across all 32 workers.
  "-XX:LoopStripMiningIter=100",
  // The ContextCleaner's periodic System.gc() (the 30s interval above in
  // GraftSession/Bench) defaults to a STOP-THE-WORLD Full GC whose cost
  // GROWS over a session — the round-18 baseline leg measured 17 Full
  // GCs of 137->322ms landing wherever the suite happened to be, the
  // amplification mechanism behind the round-17 driver record's 4-8x
  // end-of-suite tail drift. This flag turns explicit collections into
  // CONCURRENT G1 cycles: same block-cleanup cadence, no growing pauses
  // (A/B full suite: 0 Full GCs, max pause 55ms vs 322ms, total pause
  // 18.1 -> 10.1s, suite 133.6 -> 130.3s).
  "-XX:+ExplicitGCInvokesConcurrent",
)
// ad-hoc JVM flags for the forked mains (GC logging, collector probes)
// without editing the build: SPARK_GRAFT_JVM_EXTRA="-Xlog:gc*:..." sbt ...
// LIMITATION (ADVICE r16): the value splits on whitespace, so a single
// flag whose value CONTAINS a space (quoted -Xlog file paths etc.) breaks
// into bogus flags — use space-free values (every GC/JIT probe so far is)
javaOptions ++= sys.env.get("SPARK_GRAFT_JVM_EXTRA")
  .toSeq.flatMap(_.trim.split("\\s+").toSeq).filter(_.nonEmpty)
