package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query at SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line. A query that throws is reported in "errors" (name
  * -> message) and its timing is excluded from "value" — a broken query
  * must never read as a fast one.
  *
  * Measurement protocol (reproducibility, VERDICT r3 #1): a one-shot cold
  * run is dominated by JIT/codegen warmup, not plan cost — the r3 driver
  * record measured 776 s for a suite whose steady state is ~50 s, with
  * individual queries 10-45x their solo cost (compile-queue backup makes
  * whole stages run interpreted). Warmup is excluded by design; it just
  * excluded too little (only the flagship query). Two fixes, both
  * warmup-scoped — the timed region still runs the full-scale query:
  *  1. the untimed warmup runs EVERY registered query once at the tiny
  *     warmup scale (sf0.001 by default): each query's generated classes
  *     are shaped by its plan, not its input size, so this JITs the md5
  *     sketch aggregates, LSH plane expressions, native shingle/winnow/
  *     dot expressions and streaming state machinery that the old
  *     single-query warmup never touched;
  *  2. each query is timed as the BEST of `reps` (default 2) runs at the
  *     target scale, so a stray compile stall in one run cannot read as
  *     plan cost. Per-query best-of-two of steady-state plans is within
  *     noise of a single steady-state run.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARMUP_DIR", "/root/testdata/sf0.001")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt.max(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // same topology overrides as Verify: SPARK_GRAFT_MASTER (e.g.
    // local-cluster[4,8,4096] for multi-process executors),
    // SPARK_GRAFT_EXECUTOR_CLASSPATH, SPARK_GRAFT_RELIABLE
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")
    val builder = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
    // make local-cluster[n,c,mem] mean what it says: mem is only worker
    // CAPACITY; the executor -Xmx needs spark.executor.memory (see
    // GraftSession.executorMemoryFor)
    GraftSession.executorMemoryFor(master)
      .foreach(builder.config("spark.executor.memory", _))
    sys.env.get("SPARK_GRAFT_EXECUTOR_CLASSPATH")
      .foreach(builder.config("spark.executor.extraClassPath", _))
    sys.env.get("SPARK_GRAFT_RELIABLE")
      .foreach(builder.config("spark.graft.reliableCheckpoint", _))
    // stateful-volume proxy shared by the two scale-protocol knobs
    // below: the events table's bytes on disk
    val eventsBytes = {
      val evDir = new java.io.File(s"$sfDir/events.parquet")
      Option(evDir.listFiles)
        .map(_.filter(_.isFile).map(_.length).sum)
        .getOrElse(if (evDir.isFile) evDir.length else 0L)
    }
    // state-store provider: SPARK_GRAFT_STATESTORE overrides (A/B legs,
    // VERDICT r14 #5); otherwise the measured crossover rule picks it —
    // RocksDB iff forecast per-executor state exceeds half the executor
    // heap (GraftSession.autoStateStoreProvider, VERDICT r16 #2 /
    // bench/statestore_crossover_r16.json), so a small-heap scale
    // topology no longer needs a hand-set env var to avoid the on-heap
    // OOM cascade
    val stateStoreProvider = sys.env.get("SPARK_GRAFT_STATESTORE")
      .map(GraftSession.stateStoreProviderFor)
      .getOrElse(GraftSession.autoStateStoreProvider(eventsBytes,
        GraftSession.executorHeapBytesFor(master),
        GraftSession.numExecutorsFor(master)))
    builder.config("spark.sql.streaming.stateStore.providerClass",
      stateStoreProvider)
    // scale-protocol knob: streaming state-partition count scales with
    // STATE VOLUME, not cores (see StreamingOps.sizeStatePartitions);
    // the r13 100x record ran the interval joins 4-wide on 32 cores and
    // measured a 3.0x throttle (VERDICT r13 #1), so when the env does
    // not override, Bench derives the count from the corpus events
    // table itself — a scale run can no longer inherit the 1x floor
    val statePartitions = sys.env.get("SPARK_GRAFT_STREAM_STATE_PARTITIONS")
      .getOrElse(graft.streaming.StreamingOps
        .sizeStatePartitions(eventsBytes, cpus.toInt).toString)
    builder.config("spark.graft.streamStatePartitions", statePartitions)
    val spark = builder
      // keep generated methods JIT-compilable (see GraftSession)
      .config("spark.sql.codegen.hugeMethodLimit", "8000")
      // file-open cost modeled at 1 MB (default 4 MB floors the split
      // size): synthetic text compresses ~10:1, so a CPU-dense scan of
      // a small compressed file was planned 2 tasks wide regardless of
      // its row groups — the only above-linear ratios in the 10x probe
      // traced to exactly this. 1 MB lets a multi-row-group file split
      // to its group count; single-row-group files (the sf0.1 harness
      // layout) are unaffected either way.
      .config("spark.sql.files.openCostInBytes", (1024 * 1024).toString)
      // keep every warmup-compiled generated class resident through the
      // timed region (default cache: 100 entries — the suite evicts it)
      .config("spark.sql.codegen.cache.maxEntries", "1000")
      // localCheckpoint blocks are freed by the ContextCleaner only after
      // a JVM GC notices the dropped plan references; with a large heap,
      // GC can lag many queries behind, so checkpointed intermediates
      // accumulate and executions get slower over a session (measured).
      // A short periodic-GC interval bounds that drift.
      .config("spark.cleaner.periodicGC.interval", "30s")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // same deterministic plan surface as Verify: every timed query runs
    // with the SQL functions + token-count rewrite active
    GraftExtensions.register(spark)
    def esc(s: String): String =
      s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => " "
        case c => c.toString
      }
    // optional arg: comma-separated query-name filter (local iteration)
    val only: Option[Set[String]] =
      if (args.nonEmpty) Some(args(0).split(",").toSet) else None
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    // untimed warmup: session/codegen infra init first, then one tiny-scale
    // pass over every selected query (see protocol note above). Warmup
    // failures are NON-FATAL but must be visible: a missing warmup dataset
    // would otherwise silently revert the whole run to cold timings and
    // change what is measured (ADVICE r4).
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    var warmupFailures = 0
    selected.foreach { case (name, fn) =>
      try fn(spark, warmDir).count() catch {
        case e: Throwable =>
          warmupFailures += 1
          System.err.println(s"[graft.Bench] WARMUP FAILED for $name at $warmDir: " +
            Option(e.getMessage).getOrElse(e.getClass.getName).take(200))
      }
    }
    if (warmupFailures > 0)
      System.err.println(s"[graft.Bench] WARNING: $warmupFailures/${selected.size} warmup " +
        "runs failed — timings below may include JIT/codegen warmup (cold)")
    // known-bimodal queries get a third rep (VERDICT r14 #3): at one HEAD
    // the in-suite best-of-2 spread vs the solo canonical reached 7.5x
    // (mm_resize 4.90 vs 0.65 s) — JDK codec work is allocation-heavy, so
    // a GC pause or compile stall can eat BOTH reps; one extra rep bounds
    // a single stall's leverage on the recorded best. The set is the
    // measured outlier list (codec family + the two trigger-timing
    // stragglers), not a blanket raise — suite cost stays ~seconds.
    // The floor applies only when reps >= 2 (ADVICE r15): an explicit
    // reps=1 run is asking for cold/one-shot timings, and silently
    // running a ~12-minute scale query three times while recording
    // "reps":1 makes the protocol claim false.
    val bimodal = Set("mm_resize", "mm_resize_exec", "mm_decode",
      "mm_audio_decode", "mm_audio_fingerprint", "mm_features",
      "dedup_minhash_calibration", "stream_hot_users")
    val repsBimodal = if (reps >= 2) reps.max(3) else reps
    val timings = scala.collection.mutable.LinkedHashMap[String, Double]()
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    selected.foreach { case (name, fn) =>
      var best = Double.MaxValue
      var rep = 0
      val nReps = if (bimodal(name)) repsBimodal else reps
      while (rep < nReps && !errors.contains(name)) {
        val up0 = java.lang.management.ManagementFactory.getRuntimeMXBean.getUptime
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).count()
          best = best.min((System.nanoTime() - t0) / 1e9)
        } catch {
          case e: Throwable =>
            errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
        }
        // per-rep trace with JVM-uptime window bounds, for correlating a
        // rep's wall time against an -Xlog:gc log's uptime stamps
        // (the r15 variance band's stream outliers; VERDICT r15 #3)
        if (sys.env.contains("SPARK_GRAFT_BENCH_TRACE"))
          System.err.println(String.format(java.util.Locale.ROOT,
            "[graft.Bench.trace] %s rep=%d %.3fs up=[%.1f,%.1f]", name,
            Integer.valueOf(rep), Double.box((System.nanoTime() - t0) / 1e9),
            Double.box(up0 / 1e3), Double.box(
              java.lang.management.ManagementFactory.getRuntimeMXBean.getUptime / 1e3)))
        rep += 1
      }
      if (!errors.contains(name)) timings(name) = best
    }
    val qs = timings.map { case (k, v) => "\"" + esc(k) + "\":" + v }.mkString("{", ",", "}")
    val es = errors.map { case (k, v) => "\"" + esc(k) + "\":\"" + esc(v) + "\"" }.mkString("{", ",", "}")
    val total = timings.values.sum
    // "metric"/"value" stay FIRST (the driver's contract keys) but the
    // total is REPEATED after the big "queries" map: the driver keeps
    // only the tail of a long line, so trailing placement is what makes
    // the suite total recoverable from BENCH_r{N}.json (VERDICT r8 #4)
    // reps_bimodal + the bimodal list make the record match what ran:
    // the effective rep count for the listed queries, not just the
    // requested default (ADVICE r15 — r15 "reps":1 records actually
    // ran best-of-3 on these eight)
    val bimodalJson = bimodal.toSeq.sorted
      .map("\"" + _ + "\"").mkString("[", ",", "]")
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$es,"n_ok":${timings.size},"n_err":${errors.size},"total_sec":$total,"reps":$reps,"reps_bimodal":$repsBimodal,"bimodal":$bimodalJson,"warmup":"$warmDir","sf":"$sfDir","stream_state_partitions":$statePartitions,"state_store_provider":"${stateStoreProvider.split('.').last}"}"""
    println(line)
    // ALSO persist the full record in the repo (VERDICT r11 #8): the
    // driver's BENCH_r{N}.json keeps only the tail of a long line, so
    // the head of the per-query map is unrecoverable from it — this file
    // carries every per-query timing for round-over-round diffs.
    if (only.isEmpty) // a filtered run must not masquerade as the suite
      try {
        val out = java.nio.file.Paths.get(
          sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench/last_run.json"))
        Option(out.getParent).foreach(java.nio.file.Files.createDirectories(_))
        java.nio.file.Files.writeString(out, line + "\n")
      } catch { case e: Throwable =>
        System.err.println(s"[graft.Bench] could not persist bench record: ${e.getMessage}")
      }
    spark.stop()
  }
}
