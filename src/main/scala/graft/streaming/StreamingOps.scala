package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/** Structured Streaming twins of the batch operators: the reference's
  * pipeline (tokenize -> count) and the event-window aggregations, run
  * incrementally with watermarks and state.
  *
  * The batch/streaming split mirrors production: identical
  * transformations, only the source (`readStream`) and sink
  * (`writeStream` + output mode) differ. Tests drive these with a
  * file/memory source via `runToMemory` (AvailableNow +
  * awaitTermination — see its scaladoc for why not
  * processAllAvailable).
  */
object StreamingOps {

  /** Streaming token count over a text-file directory — the reference's
    * canonical query as an incremental pipeline. Complete-mode aggregate:
    * the running (token, cnt) table.
    */
  def tokenCountStream(spark: SparkSession, inputDir: String): DataFrame =
    spark.readStream
      .format("text")
      .load(inputDir)
      .select(explode(split(col("value"), "\\s+")).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy("token")
      .agg(count(lit(1)).as("cnt"))

  /** Windowed event aggregation with a watermark: tumbling 1h windows on
    * event time, late data beyond 2h dropped, append-mode-capable.
    * The value sum accumulates in DECIMAL so the result is independent of
    * partition/batch arrival order (double addition is not associative).
    */
  def windowedEventCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Session windows on event time (native session_window — the
    * streaming-first form of EventWindows.sessionize).
    */
  def sessionizedEvents(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("sess_start"),
        col("user_id"), col("n_events"))

  case class UserEvent(user_id: Long, event_type: String, value_micros: Long)
  case class UserRunning(user_id: Long, n_events: Long, total_value_micros: Long)

  /** Custom state: running per-user totals via mapGroupsWithState — the
    * escape hatch for state machines the built-in windows can't express.
    * Values accumulate as integral micros (floor(value*1e6)) so the state
    * fold is exact and commutative — the result is identical no matter how
    * events are batched or ordered, which keeps it oracle-comparable.
    */
  def runningUserTotals(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    events.select(col("user_id"), col("event_type"),
        floor(col("value") * lit(1000000L)).cast("long").as("value_micros"))
      .as[UserEvent]
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (uid: Long, evs: Iterator[UserEvent], state: GroupState[UserRunning]) =>
          val prev = state.getOption.getOrElse(UserRunning(uid, 0L, 0L))
          val (n, v) = evs.foldLeft((prev.n_events, prev.total_value_micros)) {
            case ((cn, cv), e) => (cn + 1, cv + e.value_micros)
          }
          val next = UserRunning(uid, n, v)
          state.update(next)
          next
      }.toDF()
  }

  /** Drive any streaming frame to a memory sink and block until the
    * AvailableNow run TERMINATES — the local harness for tests.
    *
    * awaitTermination, not processAllAvailable: an AvailableNow query
    * runs trailing NO-DATA batches after the data batches (that final
    * watermark advance is what flushes timed-out state in every
    * watermark-evicting twin), and processAllAvailable only promises
    * the *data* is committed — it can return while a trailing batch is
    * still appending to the memory sink, so a caller that then reads
    * the sink races the write (observed at 100x as an intermittent
    * `unread block data` task failure inside the sink's LocalTableScan
    * parallelize — the rows list was mutating mid-serialization; the
    * same race is a silent missing-rows hazard at any scale).
    * AvailableNow self-terminates exactly when every batch, including
    * the trailing no-data ones, has committed.
    */
  def runToMemory(df: DataFrame, queryName: String,
                  mode: OutputMode = OutputMode.Complete()): StreamingQuery = {
    val q = df.writeStream
      .format("memory")
      .queryName(queryName)
      // explicit scratch checkpoint (round 18): Spark's implicit temp
      // checkpoint lands under java.io.tmpdir and is recursively deleted
      // during query termination — both on the slow disk-backed path.
      // A fresh dir per CALL (never per name: reusing a checkpoint would
      // resume offsets and yield an empty sink) under the application
      // scratch root, reclaimed by the shutdown hook instead of inline.
      .option("checkpointLocation",
        s"${scratchRoot(df.sparkSession)}/${freshName(s"ckpt_$queryName")}")
      .outputMode(mode)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  // —— harness integration: the streaming twins over the sfDir tables ——
  //
  // Each runs a Structured Streaming query to completion (AvailableNow)
  // into a memory sink and returns the result as a batch DataFrame, so
  // the driver's DuckDB oracle can hash-compare streaming output against
  // plain SQL. The memory sink collects results to the driver — fine for
  // the verification corpus; a production deployment writes the same
  // frame to a file/Kafka sink instead (only the sink line changes).

  private val counter = new java.util.concurrent.atomic.AtomicLong(0)
  private def freshName(prefix: String): String =
    s"${prefix}_${counter.incrementAndGet()}"

  import org.apache.spark.sql.types._

  /** Footer-schema cache for the events file stream, keyed on the
    * file's (path, mtime, size) so a regenerated corpus re-reads. The
    * per-call `spark.read.parquet(...).schema` footer read costs
    * ~130 ms of driver metadata I/O, and every event-based twin paid it
    * once or twice PER CALL — ~4-7 s of the stream family's bench total
    * was footer re-reads of an unchanged file (round-13 profile). Pure
    * metadata, never results: the cached value is the physical schema
    * only.
    */
  private val eventSchemaCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long, Long), StructType]()

  private def eventFileSchema(spark: SparkSession, sfDir: String): StructType = {
    val path = s"$sfDir/events.parquet"
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val st = fs.getFileStatus(p)
    // a Spark-written table is a DIRECTORY named events.parquet: key on
    // the newest data file's mtime + total data bytes so a test-corpus
    // rewrite (same path, new content) invalidates
    val key = if (st.isDirectory) {
      val kids = fs.listStatus(p).filter(s => s.isFile &&
        !s.getPath.getName.startsWith("_") && !s.getPath.getName.startsWith("."))
      (path, kids.map(_.getModificationTime).foldLeft(0L)(math.max),
        kids.map(_.getLen).sum)
    } else (path, st.getModificationTime, st.getLen)
    eventSchemaCache.computeIfAbsent(key, _ => spark.read.parquet(path).schema)
  }

  /** events.parquet as a file stream. File streams need an explicit
    * schema, taken from a batch footer read of the same file so the
    * stream tracks whichever physical `ts` the harness generated:
    * BIGINT nanos (earlier rounds' TIMESTAMP(NANOS) under nanosAsLong,
    * floored to micros) or TIMESTAMP(MICROS) (current corpus; the
    * NTZ->LTZ cast is the identity instant under the UTC session).
    * Either way downstream sees a proper event-time TIMESTAMP for
    * watermarking. The footer read is driver-side metadata only — no
    * job runs.
    */
  def harnessEventStream(spark: SparkSession, sfDir: String): DataFrame = {
    val fileSchema = eventFileSchema(spark, sfDir)
    spark.readStream
      .schema(fileSchema)
      // brace-glob: the file stream source needs a directory-rooted glob
      // (a bare file path fails the basePath-must-be-a-directory check)
      .parquet(s"$sfDir/{events.parquet}")
      .withColumn("ts", eventTsNormalized(fileSchema))
  }

  private def eventTsNormalized(fileSchema: StructType) =
    fileSchema("ts").dataType match {
      case LongType => timestamp_micros(expr("(ts - pmod(ts, 1000L)) div 1000L"))
      case _        => col("ts").cast("timestamp")
    }

  /** Sentinel identity of the end-of-stream heartbeat row (below). */
  val heartbeatUserId: Long = -1L
  // 2200-01-01T00:00:00Z — beyond any harness corpus event time, so the
  // heartbeat's watermark update provably passes every real event.
  private val heartbeatEpochSec = 7258118400L

  private val heartbeatWritten = scala.collection.mutable.Set[String]()

  /** One-row parquet directory holding the heartbeat event (user_id -1,
    * event_type "view", ts far future), written once per application per
    * events-schema variant. The batch write runs on the shared
    * SparkContext; the lock serializes first-writers across the
    * concurrently-started streaming twins.
    */
  private def heartbeatDir(spark: SparkSession, fileSchema: StructType): String = {
    // rooted under java.io.tmpdir (the Bucketed.scopedPath pattern), not
    // a cwd-relative path: a run launched from another working directory
    // — or one whose default FS is distributed — must still create and
    // read the side source at the same resolved location (ADVICE r10)
    // under the streaming scratch root (round 18): the heartbeat is
    // re-listed and re-read by every flushed twin's side source, and the
    // application's shutdown hook reclaims the whole root
    val dir = s"${scratchRoot(spark)}/heartbeat/" +
      java.lang.Integer.toHexString(fileSchema.json.hashCode)
    heartbeatWritten.synchronized {
      if (!heartbeatWritten.contains(dir)) {
        val values: Seq[Any] = fileSchema.fields.toSeq.map { f =>
          (f.name, f.dataType) match {
            case ("ts", LongType) => heartbeatEpochSec * 1000000000L // nanos variant
            case ("ts", TimestampNTZType) =>
              java.time.LocalDateTime.ofEpochSecond(heartbeatEpochSec, 0,
                java.time.ZoneOffset.UTC)
            case ("ts", _) =>
              java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(heartbeatEpochSec))
            case ("user_id", _)   => heartbeatUserId
            case ("event_id", _)  => -1L
            case ("event_type", _) => "view"
            case _ => null
          }
        }
        spark.createDataFrame(
            java.util.Arrays.asList(org.apache.spark.sql.Row.fromSeq(values)),
            fileSchema)
          .coalesce(1).write.mode("overwrite").parquet(dir)
        heartbeatWritten += dir
      }
    }
    dir
  }

  /** `harnessEventStream` plus a far-future heartbeat row from a side
    * file source — stream-close punctuation. A watermark only advances
    * on DATA, so a finite replay with delay `d` leaves its final `d` of
    * events below the watermark forever: buffered state never drains and
    * the run can't match a whole-corpus batch oracle. The heartbeat is
    * the standard fix (Flink calls it a punctuation; Kafka pipelines
    * emit broker heartbeats for exactly this): one sentinel whose event
    * time exceeds every real event by more than the delay, so the final
    * watermark passes the whole corpus. The sentinel carries user_id -1
    * and must be swallowed by the consuming state function — it is kept
    * OUT of the pre-state filters deliberately, because a predicate that
    * excluded it could legally be pushed below the watermark node by the
    * optimizer, and then the watermark would never advance.
    */
  def harnessEventStreamFlushed(spark: SparkSession, sfDir: String): DataFrame = {
    val fileSchema = eventFileSchema(spark, sfDir)
    val ts = eventTsNormalized(fileSchema)
    val hb = spark.readStream.schema(fileSchema)
      .parquet(heartbeatDir(spark, fileSchema))
      .withColumn("ts", ts)
    harnessEventStream(spark, sfDir).unionByName(hb)
  }

  /** documents.parquet as a file stream. */
  def harnessDocStream(spark: SparkSession, sfDir: String): DataFrame =
    spark.readStream
      .schema(StructType(Seq(
        StructField("doc_id", LongType), StructField("text", StringType),
        StructField("lang", StringType), StructField("source", StringType),
        StructField("n_chars", LongType))))
      .parquet(s"$sfDir/{documents.parquet}")

  /** [[harnessDocStream]] widened for a CPU-DENSE per-row stage (round
    * 17). A file-source micro-batch's task count follows the arriving
    * FILE LAYOUT (one single-row-group file = one task — the
    * streamBpeEncode parallelism note), so an ingest twin whose
    * per-row work is hash-heavy runs its whole batch on ONE core here.
    * The widen is an explicit doc_id-keyed exchange to the session's
    * core count, GATED on the static input mass the way
    * Rebalance.cpuSpreadIfNarrow gates batch scans: a corpus big
    * enough that its batches already split to session width skips it,
    * so at scale no corpus-byte exchange is added. Column pruning
    * pushes through the repartition, so each twin ships only the
    * columns it reads; results are partitioning-independent by the
    * determinism contract (keyed state / commutative aggregation,
    * oracle-gated).
    *
    * Applied SELECTIVELY, on measurement (round-17 solo A/B over all
    * doc twins): the exchange plus the extra per-batch task waves cost
    * ~0.2-0.4 s at 1x, so only the twins whose stateless map work is
    * genuinely expensive keep it — the k=16 minhash sketch pair
    * (addBatch 1.06→0.69 / 1.47→1.00 s) and the rule cascade
    * (1.49→0.77 s). Every other twin measured flat or worse widened
    * (e.g. stream_pii 0.80→1.09, stream_phash's codec 2x WORSE at
    * 32-way — ImageIO contention) and stays narrow.
    */
  def harnessDocStreamWide(spark: SparkSession, sfDir: String): DataFrame =
    cpuWidenStream(spark, s"$sfDir/documents.parquet",
      harnessDocStream(spark, sfDir), col("doc_id"))

  private[graft] def cpuWidenStream(spark: SparkSession, inputPath: String,
                                    df: DataFrame,
                                    keys: org.apache.spark.sql.Column*): DataFrame = {
    val w = spark.sparkContext.defaultParallelism
    val maxSplit = spark.sessionState.conf.filesMaxPartitionBytes
    if (staticInputBytes(spark, inputPath) >= w.toLong * maxSplit) df
    else df.repartition(w, keys: _*)
  }

  /** Bytes on disk of a static harness input (file or Spark-written
    * directory) — the stream-side scale proxy for the widen gate. */
  private def staticInputBytes(spark: SparkSession, path: String): Long = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) 0L
    else {
      val st = fs.getFileStatus(p)
      if (st.isFile) st.getLen
      else fs.listStatus(p).filter(_.isFile).map(_.getLen).sum
    }
  }

  /** embeddings.parquet as a file stream. */
  def harnessEmbStream(spark: SparkSession, sfDir: String): DataFrame =
    spark.readStream
      .schema(StructType(Seq(
        StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType)),
        StructField("label", IntegerType))))
      .parquet(s"$sfDir/{embeddings.parquet}")

  /** State-partition count for the harness streaming queries. A
    * stateful operator's shuffle-partition count is FROZEN into its
    * state layout at query start, and every state partition carries its
    * own store instances (a stream-stream join holds FOUR per
    * partition), each committing a snapshot file per micro-batch — at
    * the harness's key cardinality (thousands of keys), 32 partitions
    * are pure per-batch commit overhead: measured 13-18 s for the
    * interval join at 32 vs ~4-6 s at 4-8, identical results; the r13
    * A/B put 4 another ~10-15% ahead of 8 on the five slowest twins,
    * still identical results (the full oracle gate re-verifies). This is
    * the knob a production deployment sizes UP with state volume (state
    * must fit per partition, and parallelism caps at this count) — the
    * number is per-workload, NOT per-cluster-core like batch shuffle
    * partitions. Overridable via `spark.graft.streamStatePartitions`
    * on the calling session (default 4) so a deployment sizes it to its
    * state volume without recompiling; Bench/Verify forward the
    * `SPARK_GRAFT_STREAM_STATE_PARTITIONS` env var into this conf so the
    * scale protocol sizes it per run — the r13 100x record ran the
    * interval joins 4-wide on a 32-core box and charged the 3.0x
    * throttle to the relation (VERDICT r13 #1); the scale rule is in
    * BASELINE.md's protocol note.
    */
  private def stateShufflePartitions(spark: SparkSession): Int =
    spark.conf.get("spark.graft.streamStatePartitions", "4").toInt

  /** Scale-protocol sizing rule for `spark.graft.streamStatePartitions`
    * (VERDICT r13 #1/#8). The count scales with STATE VOLUME, not
    * cores: per-batch store-commit overhead grows with partition count,
    * so small state wants few partitions (solo reps-3 A/B at sf0.1: the
    * 43-twin family runs ~8% faster 4-wide than 8-wide, identical
    * results), while a scale record must not run throttled — the r13
    * 100x record ran the interval joins 4-wide on a 32-core box and
    * measured 3.0x slower than 32-wide on the biggest line item. Rule:
    * one state partition per 4 MB of stateful-input bytes (the events
    * table on disk is the proxy — join/window state is a bounded slice
    * of it), floored at 4, capped at the session's cores. Bench derives
    * the bytes from the corpus when `SPARK_GRAFT_STREAM_STATE_PARTITIONS`
    * does not override, so a future scale run cannot silently inherit
    * the 1x floor; StatePartitionSizingSpec pins the rule's shape.
    *
    * Scope (VERDICT r14 #5): this is a PARALLELISM rule — it sizes how
    * wide state work spreads and what the per-batch store-commit
    * overhead is. It is NOT the memory-fit rule: the default
    * HDFS-backed provider keeps each partition's state on executor
    * HEAP, so once per-partition state (stateful volume / cores, after
    * the cap binds) approaches executor heap, the lever is the
    * disk-backed RocksDB state-store provider
    * (`SPARK_GRAFT_STATESTORE=rocksdb` in Bench/Verify; stock Spark),
    * not more partitions. The 100x A/B of both providers is recorded in
    * BASELINE.md.
    */
  def sizeStatePartitions(statefulInputBytes: Long, cores: Int): Int = {
    val volumeBound = (statefulInputBytes / (4L << 20)).toInt
    math.max(4, math.min(math.max(cores, 4), volumeBound.max(1)))
  }

  private def runToBatch(spark: SparkSession, build: SparkSession => DataFrame,
                         prefix: String, mode: OutputMode): DataFrame = {
    // state-partition sizing is scoped to a CLONED session — same
    // SparkContext and shared state, separate SQL conf and catalog —
    // so the surrounding session's parallelism is NEVER touched, not
    // even during query start (the old set/restore pattern left a
    // window where a concurrent batch query inherited the reduced
    // width; ConcurrencySpec pins the isolation). The stream must be
    // BUILT against the clone: a streaming query freezes the state
    // layout from its DataFrame's own session conf at start, and the
    // memory sink registers in that session's catalog, hence the
    // builder-closure shape and the scoped.table read.
    //
    // SINK choice is by output mode, and it is a SCALE decision, not a
    // convenience: Complete-mode results are aggregate tables (bounded
    // by key/window cardinality, scale-invariant under data growth), so
    // the memory sink is safe and cheapest. Append/Update results grow
    // WITH the data (the interval joins emit millions of pairs at 100x,
    // transitions one pair per event) — a memory sink funnels all of
    // that through driver heap and the downstream reduction then
    // re-serializes it task-by-task out of a ParallelCollectionRDD
    // (measured at 100x: driver OOM at the default 8g heap, and the
    // largest single cost in the interval-join timings). Those modes
    // write a PARQUET sink instead — executors write, executors read
    // back, the driver never holds a row — which is also the production
    // shape the class doc promises ("only the sink line changes").
    val name = freshName(prefix)
    val scoped = spark.newSession()
    scoped.conf.set("spark.sql.shuffle.partitions",
      stateShufflePartitions(spark).toString)
    if (mode == OutputMode.Complete()) {
      val q = runToMemory(build(scoped), name, mode)
      q.stop()
      scoped.table(name)
    } else {
      val dir = s"${scratchRoot(spark)}/$name"
      val df = build(scoped)
      val q =
        if (mode == OutputMode.Append())
          // the native file sink is Append-only by contract; its
          // metadata log makes it exactly-once under batch replay
          df.writeStream
            .format("parquet")
            .option("path", s"$dir/out")
            .option("checkpointLocation", s"$dir/ckpt")
            .outputMode(mode)
            .trigger(Trigger.AvailableNow())
            .start()
        else
          updateSinkWriter(df, dir).start()
      q.awaitTermination() // see runToMemory: trailing-batch-safe drain
      // explicit schema: a zero-emission stream leaves no data files,
      // and the harness still owes the caller a typed empty frame.
      // recursiveFileLookup: Update-mode rows live in per-batch subdirs
      new java.io.File(s"$dir/out").mkdirs()
      scoped.read.schema(df.schema)
        .option("recursiveFileLookup", "true").parquet(s"$dir/out")
    }
  }

  /** Update-mode sink: IDEMPOTENT per-batch parquet via foreachBatch.
    * `foreachBatch` is at-least-once — a failure between the parquet
    * commit and the offset-log commit re-runs the micro-batch on
    * restart — so each batch OVERWRITES its own batch-stamped directory
    * (`out/batch-<id>`): a replayed batch replaces itself instead of
    * double-appending, which makes the sink exactly-once for any
    * downstream reader of `out/` regardless of retries or checkpoint
    * reuse. UpdateSinkReplaySpec drops the last commit-log entry,
    * restarts the query, and proves the read-back row set unchanged.
    * (The memory sink stays Complete-only: Append/Update results grow
    * with the data and must never funnel through driver heap.)
    */
  private[graft] def updateSinkWriter(df: DataFrame, dir: String) =
    df.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        batch.write.mode("overwrite").parquet(s"$dir/out/batch-$id"); ()
      }
      .option("checkpointLocation", s"$dir/ckpt")
      .outputMode(OutputMode.Update())
      .trigger(Trigger.AvailableNow())

  /** Per-application scratch root for the file-sink twins, deleted by a
    * JVM shutdown hook — without it, every run/JVM leaks its sink +
    * checkpoint directories under java.io.tmpdir (millions of pair rows
    * per run at 100x), eventually exhausting /tmp on a long-lived bench
    * machine (ADVICE r14). Registered once per ROOT, not once per JVM
    * (ADVICE r15): a JVM that runs several SparkContexts in sequence
    * (sbt test JVMs, back-to-back harness runs) gets one hook per
    * application root, so every application's scratch is reclaimed —
    * each hook deletes only its own application's directory, never a
    * concurrent run's. The mechanism lives in
    * GraftSession.cleanupAtShutdown, shared with the Materialize seam's
    * default checkpoint dir.
    */
  private def scratchRoot(spark: SparkSession): String = {
    // rooted at GraftSession.scratchBase (round 18): RAM-backed scratch
    // when the node has one — the checkpoint/sink metadata commits
    // (offset WAL, commit log, state deltas, sink logs) are the
    // dominant fixed cost of a short AvailableNow query on a disk-backed
    // tmpdir, and these dirs are deleted at JVM exit by construction.
    // Production overrides via spark.graft.scratchDir (see scratchBase).
    val root = s"${graft.GraftSession.scratchBase(spark)}/graft-stream-sink/" +
      spark.sparkContext.applicationId
    graft.GraftSession.cleanupAtShutdown(root)
    root
  }

  /** Streaming tumbling-window twin of EventWindows.tumbling, surfaced
    * with epoch-second window starts for the oracle.
    */
  def streamTumbling(spark: SparkSession, sfDir: String): DataFrame =
    runToBatch(spark, s => windowedEventCounts(harnessEventStream(s, sfDir)),
        "stream_tumbling", OutputMode.Complete())
      .select(unix_timestamp(col("win_start")).as("win_start"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy("win_start", "event_type")

  /** Append-mode streaming tumbling windows — the STATE-BOUNDED
    * production path (VERDICT r3 #3's missing twin): unlike the
    * Complete-mode harness queries, the watermark here actually evicts —
    * a window is emitted exactly once, when the watermark passes its
    * end, and its state is dropped; windows still open when input ends
    * stay in state and are never emitted. At 100 TB/day this is the
    * shape that works: state is bounded by (watermark delay / window
    * size) windows per key, not by stream length. AvailableNow runs
    * trailing no-data batches after the data batches, so the final
    * watermark (max event time - 2h) flushes every window it passed.
    */
  def streamTumblingAppend(spark: SparkSession, sfDir: String): DataFrame =
    runToBatch(spark, s => windowedEventCounts(harnessEventStream(s, sfDir)),
        "stream_tumbling_append", OutputMode.Append())
      .select(unix_timestamp(col("win_start")).as("win_start"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy("win_start", "event_type")

  /** Streaming sliding-window twin of EventWindows.sliding: 1 h windows
    * every 30 min, each event contributing to width/slide = 2 windows
    * (Spark's window() replicates then groups, same as the batch
    * spelled-out form). Complete-mode harness twin like streamTumbling.
    */
  def streamSliding(spark: SparkSession, sfDir: String): DataFrame =
    runToBatch(spark,
        s => harnessEventStream(s, sfDir)
          .withWatermark("ts", "2 hours")
          .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
          .agg(count(lit(1)).as("n")),
        "stream_sliding", OutputMode.Complete())
      .select(unix_timestamp(col("window.start")).as("win_start"),
        col("event_type"), col("n"))
      .orderBy("win_start", "event_type")

  /** Streaming session windows (native session_window) per user.
    * session_window merges an event landing exactly at the current
    * window end (gap-touching), so a new session starts only when the
    * event-time gap EXCEEDS 30 min — the same boundary as the batch
    * sessionize (StreamingSpec pins it). Output: one row per session
    * with its start (micros).
    */
  def streamSessions(spark: SparkSession, sfDir: String): DataFrame =
    runToBatch(spark, s => sessionizedEvents(harnessEventStream(s, sfDir)),
        "stream_sessions", OutputMode.Complete())
      .select(col("user_id"), unix_micros(col("sess_start")).as("sess_start_us"),
        col("n_events"))
      .orderBy("user_id", "sess_start_us")

  /** Append-mode streaming sessions — the state-bounded sessionization
    * path: a session is emitted exactly once, when the watermark (max
    * event time - 2h) passes its end (last event + gap), and its state
    * is dropped; sessions still open at end of input are never emitted.
    * Complete-mode twin: streamSessions. State is bounded by the
    * watermark delay per user, not by stream length.
    */
  def streamSessionsAppend(spark: SparkSession, sfDir: String): DataFrame =
    runToBatch(spark, s => sessionizedEvents(harnessEventStream(s, sfDir)),
        "stream_sessions_append", OutputMode.Append())
      .select(col("user_id"), unix_micros(col("sess_start")).as("sess_start_us"),
        col("n_events"))
      .orderBy("user_id", "sess_start_us")

  /** Streaming twin of urlcount_counts over documents.text (space
    * tokenizer + empty-token filter, identical semantics).
    */
  def streamTokenCounts(spark: SparkSession, sfDir: String): DataFrame =
    runToBatch(spark,
        s => harnessDocStream(s, sfDir)
          .select(explode(split(col("text"), " ")).as("token"))
          .filter(length(col("token")) > 0)
          .groupBy("token")
          .agg(count(lit(1)).as("cnt")),
        "stream_tokens", OutputMode.Complete())
      .orderBy("token")

  /** Ingest-time URL canonicalization monitor — the streaming twin of
    * urlcount_canonical's host rollup: the per-row canonicalization is
    * stateless, and the Complete-mode rollup's state is bounded by the
    * host count. Drops the batch form's distinct-page count (a distinct
    * aggregation under a streaming rollup is unsupported); host-level
    * n_urls/n_tracked is the signal an ingest monitor alerts on.
    */
  def streamCanonicalHosts(spark: SparkSession, sfDir: String): DataFrame =
    runToBatch(spark,
        s => graft.ops.UrlCount.canonicalUrls(harnessDocStream(s, sfDir))
          .groupBy("host")
          .agg(count(lit(1)).as("n_urls"), sum(col("tracked")).as("n_tracked")),
        "stream_urls", OutputMode.Complete())
      .orderBy("host")

  /** Streaming exact dedup: the stateful ingest-time variant of
    * Dedup.exact — dropDuplicates over the normalized-content key keeps
    * the FIRST arrival per key in the state store and suppresses the
    * rest. Emits the distinct content keys (which doc wins per key is
    * arrival-order-dependent, so only the key — deterministic — is
    * surfaced). State is UNBOUNDED on an infinite stream — this form is
    * the oracle twin; `streamExactDedupBounded` is the production path.
    */
  def streamExactDedup(spark: SparkSession, sfDir: String): DataFrame =
    runToBatch(spark,
        s => harnessDocStream(s, sfDir)
          .select(md5(lower(regexp_replace(trim(col("text")), "\\s+", " ")))
            .as("content_key"))
          .dropDuplicates("content_key"),
        "stream_dedup", OutputMode.Append())
      .orderBy("content_key")

  /** Deterministic stand-in arrival time for the harness doc stream:
    * doc_id seconds from epoch + 1 day. Production replaces this with the
    * real ingest timestamp (Kafka record time / source current_timestamp);
    * a doc_id-derived time keeps the harness run oracle-checkable. The
    * one-day offset keeps doc 0 off the exact epoch: the stateful
    * operator's initial watermark IS the epoch, and a row landing exactly
    * on the watermark is filtered as late.
    */
  private def withIngestTs(docs: DataFrame): DataFrame =
    docs.withColumn("ingest_ts", timestamp_seconds(col("doc_id") + lit(86400L)))

  /** Watermark-BOUNDED ingest dedup — the production form of
    * `streamExactDedup` (VERDICT r4 missing #1): state for a content key
    * lives only until the watermark (max ingest time - `delay`) passes
    * it, so on an infinite stream the state store holds one retention
    * window of keys, not the stream's whole history. The trade is
    * explicit: a duplicate re-arriving AFTER its key was evicted is
    * re-emitted (StreamingSpec pins exactly that boundary); within the
    * retention window suppression is identical to the unbounded twin.
    * The harness corpus spans less than `delay`, so nothing evicts and
    * the oracle is the same distinct-keys relation the unbounded twin
    * verifies — the bounded plan shape is what's under test here.
    */
  def streamExactDedupBounded(spark: SparkSession, sfDir: String,
                              delay: String = "2 hours"): DataFrame =
    runToBatch(spark,
        s => withIngestTs(harnessDocStream(s, sfDir))
          .select(md5(lower(regexp_replace(trim(col("text")), "\\s+", " ")))
            .as("content_key"), col("ingest_ts"))
          .withWatermark("ingest_ts", delay)
          .dropDuplicatesWithinWatermark("content_key")
          .select("content_key"),
        "stream_dedup_bounded", OutputMode.Append())
      .orderBy("content_key")

  /** Streaming FUZZY dedup at ingest — the minhash twin of
    * streamExactDedup (VERDICT r3 missing #5): each arriving doc gets a
    * per-row md5-family minhash sketch (k=16 over 3-word shingles —
    * IDENTICAL math to the batch minHashLsh sketch, DedupSpec pins the
    * family), and docs whose whole sketch matches an earlier arrival are
    * suppressed by the state store. Sketch-equality is the strictest LSH
    * rung (all k minima agree ~ Jaccard ≈ 1), the right ingest-time
    * filter: it kills exact dups AND boilerplate re-crawls without a
    * shuffle-heavy band join in the hot path. Emits the distinct sketch
    * signatures (which doc wins per sketch is arrival-order-dependent,
    * so only the deterministic signature is surfaced). The per-row
    * sketch is the native MinHashArrayExpr (codegen'd tight loop, same
    * md5 family); the batch path uses the TypedImperativeAggregate
    * instead. State is unbounded — oracle twin; the production path is
    * `streamMinhashDedupBounded`.
    */
  def streamMinhashDedup(spark: SparkSession, sfDir: String, k: Int = 16): DataFrame = {
    val sketch = graft.functions.ShingleColumns.minhashArray(col("shingles"), k)
    runToBatch(spark,
        s => harnessDocStreamWide(s, sfDir)
          .select(graft.functions.ShingleColumns.wordShingles(col("text"), 3).as("shingles"))
          .filter(size(col("shingles")) > 0) // shingle-less docs have no sketch
          .select(array_join(transform(sketch, m => m.cast("string")), ",").as("sketch_sig"))
          .dropDuplicates("sketch_sig"),
        "stream_dedup_fuzzy", OutputMode.Append())
      .orderBy("sketch_sig")
  }

  /** Watermark-bounded ingest FUZZY dedup — `streamMinhashDedup` with
    * the same retention semantics as `streamExactDedupBounded`: the
    * per-key sketch state is evicted once the watermark passes its
    * ingest time + `delay`, bounding the state store to one retention
    * window of distinct sketches. Suppression within the window is
    * identical to the unbounded twin (same per-row MinHashArrayExpr
    * sketch, same signature key), so the oracle relation is shared.
    */
  def streamMinhashDedupBounded(spark: SparkSession, sfDir: String, k: Int = 16,
                                delay: String = "2 hours"): DataFrame = {
    val sketch = graft.functions.ShingleColumns.minhashArray(col("shingles"), k)
    runToBatch(spark,
        s => withIngestTs(harnessDocStreamWide(s, sfDir))
          .select(col("ingest_ts"),
            graft.functions.ShingleColumns.wordShingles(col("text"), 3).as("shingles"))
          .filter(size(col("shingles")) > 0) // shingle-less docs have no sketch
          .select(col("ingest_ts"),
            array_join(transform(sketch, m => m.cast("string")), ",").as("sketch_sig"))
          .withWatermark("ingest_ts", delay)
          .dropDuplicatesWithinWatermark("sketch_sig")
          .select("sketch_sig"),
        "stream_dedup_fuzzy_bounded", OutputMode.Append())
      .orderBy("sketch_sig")
  }

  /** Streaming decontamination — the ingest-time twin of
    * Dedup.decontaminate: each arriving doc's 3-word shingles are
    * stream-static joined against the (static, broadcast) eval-set
    * shingle table and docs with >= minOverlap hits are flagged. The
    * stream-static join is STATELESS — the static side is planned like
    * any batch broadcast join, so the hot path stays narrow per row; the
    * only state is the per-doc overlap aggregate, and each doc's
    * shingles arrive in one row, so a doc's group completes within its
    * micro-batch. This is the shape for "reject benchmark-contaminated
    * docs before they enter the corpus" rather than sweeping after.
    */
  def streamDecontaminate(spark: SparkSession, sfDir: String,
                          evalMod: Int = 97, minOverlap: Int = 3): DataFrame = {
    runToBatch(spark,
        s => {
          // static side built on the SAME scoped session as the stream
          // (one plan must not mix sessions)
          val evalShingles = broadcast(
            graft.ops.Dedup.shingles(
                graft.GraftSession.table(s, sfDir, "documents"), 3)
              .filter(col("doc_id") % evalMod === 0)
              .select("shingle").distinct())
          harnessDocStream(s, sfDir)
            .filter(col("doc_id") % evalMod =!= 0)
            // array_distinct BEFORE the explode: the batch op's
            // distinct-per-doc, done narrowly per row — a streaming
            // dropDuplicates here would grow (doc, shingle) state forever
            .select(col("doc_id"),
              explode(array_distinct(
                graft.functions.ShingleColumns.wordShingles(col("text"), 3)))
                .as("shingle"))
            .join(evalShingles, Seq("shingle"))
            .groupBy("doc_id")
            .agg(count(lit(1)).as("n_overlap"))
        },
        "stream_decontaminate", OutputMode.Complete())
      .filter(col("n_overlap") >= minOverlap)
      .orderBy("doc_id")
  }

  /** stream_dedup_incremental: ingest-time probe of the PERSISTED band
    * signature index — the streaming half of the daily-crawl cycle
    * (batch builds/folds the index: dedup_incremental /
    * dedup_index_refresh; this flags arrivals against it in flight).
    * Arriving docs sketch per row with the native MinHashArrayExpr,
    * derive band keys as narrow array expressions, stream-STATIC join
    * the bucketed index, and score by per-row zip_with — COMPLETELY
    * STATELESS: no watermark, no state store, nothing grows with stream
    * length; the static side broadcasts per micro-batch. A pair that
    * matches in several bands emits per band; the collapse to one row
    * per pair is a per-micro-batch distinct in the production
    * foreachBatch sink (reader-side here), never cross-batch state.
    *
    * Every ARRIVING doc probes (no representative collapse — ingest
    * can't see the batch), while the index side is rep-collapsed by
    * construction; the oracle states exactly that asymmetry.
    */
  def streamIncrementalDedup(spark: SparkSession, sfDir: String,
                             mod: Int = 10, k: Int = 16,
                             bands: Int = graft.ops.Dedup.defaultLshBands,
                             minEst: Double = 0.5): DataFrame = {
    val r = k / bands
    val sk = graft.functions.ShingleColumns.minhashArray(col("shingles"), k)
    runToBatch(spark,
        s => {
          // the "yesterday" index is the SAME persisted table the batch
          // probe (dedup_incremental) reads — served once per run from
          // the store (VERDICT r14 #4; the external catalog is shared
          // state, so the scoped session sees the table): production
          // reads the table the batch job owns, and so does this twin
          val idxName =
            graft.ops.Dedup.minHashIndexTable(s, sfDir, mod, 3, k, bands)
          val idx = s.table(idxName)
            .select(col("doc_id").as("doc_idx"), col("sig"), col("sigs").as("sigs_idx"))
          harnessDocStream(s, sfDir)
            .filter(col("doc_id") % mod === 0)
            .select(col("doc_id").as("doc_new"),
              graft.functions.ShingleColumns.wordShingles(col("text"), 3).as("shingles"))
            .filter(size(col("shingles")) > 0)
            .select(col("doc_new"), sk.as("sigs_new"))
            .select(col("doc_new"), col("sigs_new"),
              explode(array((0 until bands).map(b =>
                concat(lit(b.toString), lit("|"),
                  array_join(transform(slice(col("sigs_new"), b * r + 1, r),
                    _.cast("string")), ","))): _*)).as("sig"))
            .join(idx, Seq("sig"))
            .withColumn("est_jaccard",
              size(filter(zip_with(col("sigs_new"), col("sigs_idx"), (x, y) => x === y),
                a => a)) / lit(k))
            .filter(col("est_jaccard") >= minEst)
            .select("doc_new", "doc_idx", "est_jaccard")
        },
        "stream_dedup_incremental", OutputMode.Append())
      .distinct() // multi-band matches collapse per batch, not in state
      .orderBy("doc_new", "doc_idx")
  }

  /** Stream-STREAM interval join — the remaining first-class Structured
    * Streaming shape (joins so far were stream-to-static): every
    * purchase joined to EVERY view by the same user in the preceding
    * hour (the fan-out companion to the batch as-of join, which keeps
    * only the latest). Both sides are watermarked and the join carries
    * an event-time range condition — together those bound the state
    * store: a buffered view can be dropped once the watermark proves no
    * future purchase's one-hour lookback can reach it, so state holds
    * one (watermark delay + join window) of rows per side, not the
    * stream's history. Without the time bound Spark would buffer both
    * streams forever — the range condition is load-bearing, not
    * decoration. Inner join => append mode; rows emit as soon as both
    * sides arrive.
    *
    * Timestamps are micros on both sides of the oracle comparison
    * (harnessEventStream floors nanos -> micros; the oracle compares
    * epoch_us), and the window is inclusive at both ends:
    * p_ts - 1h <= v_ts <= p_ts.
    */
  def streamViewPurchaseJoin(spark: SparkSession, sfDir: String): DataFrame = {
    runToBatch(spark,
        s => joinSides(s, sfDir) match { case (purchases, views) =>
          purchases.join(views, expr(
            "user_id = v_user AND v_ts <= p_ts AND v_ts >= p_ts - INTERVAL 1 HOUR"))
        },
        "stream_join", OutputMode.Append())
      .select(col("purchase_event_id"), col("user_id"),
        unix_micros(col("p_ts")).as("purchase_tus"),
        col("view_event_id"), unix_micros(col("v_ts")).as("view_tus"),
        (unix_micros(col("p_ts")) - unix_micros(col("v_ts"))).as("lag_us"))
      .orderBy("purchase_event_id", "view_event_id")
  }

  /** The watermarked purchase/view sides of the stream-stream joins,
    * built on the given (scoped) session so both join forms share one
    * definition. Returns (purchases, views).
    */
  private def joinSides(s: SparkSession, sfDir: String): (DataFrame, DataFrame) = {
    // ONE file-stream source referenced by both sides (round 18): the
    // previous two-call form registered two independent
    // FileStreamSources for the same file — two offset-log entries, two
    // per-trigger directory listings and two parquet scans per
    // micro-batch, all pure machinery. Deriving both branches from one
    // source makes the join a SELF-join over a single source (each
    // branch keeps its own filter, projection and watermark column);
    // rows and join semantics are identical, the source lifecycle is
    // paid once. Same rows => same oracle relation.
    val events = harnessEventStream(s, sfDir)
    val views = events
      .filter(col("event_type") === "view")
      .select(col("event_id").as("view_event_id"), col("user_id").as("v_user"),
        col("ts").as("v_ts"))
      .withWatermark("v_ts", "2 hours")
    val purchases = events
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_event_id"), col("user_id"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", "2 hours")
    (purchases, views)
  }

  case class KeyArrival(content_key: String)
  case class KeySeen(seen: Boolean)

  /** Ingest dedup as an EXPLICIT state machine — dropDuplicates
    * hand-rolled with flatMapGroupsWithState, the API for suppression
    * logic the built-in stateful operators can't express (emit-once is
    * its degenerate case; the same skeleton carries count-limited
    * emission, per-key rate limiting, or change-data suppression by
    * changing what the state records). One group per content key; the
    * first arrival emits and sets the state, every later arrival is
    * swallowed. Semantics — and oracle — identical to `streamExactDedup`
    * (the distinct content keys); which doc wins stays
    * arrival-order-dependent, so only the key is surfaced. State is
    * unbounded like the dropDuplicates twin; the watermark-bounded
    * production variant would use GroupStateTimeout.EventTimeTimeout
    * exactly as dropDuplicatesWithinWatermark does internally.
    */
  def streamExactDedupCustom(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    runToBatch(spark,
        s => harnessDocStream(s, sfDir)
          .select(md5(lower(regexp_replace(trim(col("text")), "\\s+", " ")))
            .as("content_key"))
          .as[KeyArrival]
          .groupByKey(_.content_key)
          .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
            (key: String, rows: Iterator[KeyArrival], state: GroupState[KeySeen]) =>
              val first = !state.exists
              state.update(KeySeen(true))
              rows.size // drain the iterator; arrivals beyond the first are swallowed
              if (first) Iterator single key else Iterator.empty
          }
          .toDF("content_key"),
        "stream_dedup_custom", OutputMode.Append())
      .orderBy("content_key")
  }

  case class FunnelEvent(user_id: Long, sidx: Int, tus: Long, event_id: Long,
                         ts: java.sql.Timestamp)
  case class FunnelOooState(reach: List[Long], buf: List[FunnelEvent])

  /** Watermark-gated buffer step shared by the out-of-order stateful
    * twins: new arrivals the watermark has already passed are dropped as
    * LATE (the same contract the built-in stateful operators apply to
    * aggregations and dedup — disorder beyond the watermark delay is
    * out of contract); the rest join the buffer; buffered events whose
    * event time the watermark has now passed become RIPE and are
    * released for folding, everything else stays buffered. Returns
    * (ripe, pending). Event times are micros, the watermark is Spark's
    * millisecond clock, so ripeness compares floor(tus/1000) <= wm.
    *
    * Boundary contract (ADVICE r10, CORRECTED r12 with measured
    * evidence — WatermarkBoundarySpec): Spark's flatMapGroupsWithState
    * late filter drops rows with event time <= the current watermark
    * BEFORE the state function runs (verified on Spark 4.1: an arrival
    * at exactly the watermark never reaches the function; one
    * millisecond past it does). So the effective lateness contract is
    * STRICT — an event late by exactly the delay is dropped by Spark
    * itself, and the delivery floor at stream start is event time > 0
    * (epoch-0 event times are degenerate: they equal the initial
    * watermark). This function still KEEPS any boundary-equal arrival
    * it is handed (tus/1000 >= wm, immediately ripe) so the engine
    * adds no second, stricter gate of its own on whatever Spark
    * delivers.
    */
  private def splitRipe[E](buf: List[E], arrivals: Iterator[E], wmMs: Long,
                           tusOf: E => Long): (List[E], List[E]) = {
    val kept = buf ++ arrivals.filter(e => tusOf(e) / 1000L >= wmMs)
    kept.partition(e => tusOf(e) / 1000L <= wmMs)
  }

  /** Streaming funnel — the ingest-time twin of EventWindows.funnel,
    * OUT-OF-ORDER TOLERANT: a per-user flatMapGroupsWithState machine
    * with event-time-timeout watermark semantics. Arrivals are BUFFERED
    * in state until the watermark (max event time - 2h) passes their
    * event time; ripe events are then folded in the batch operator's
    * total order ((tus, step-priority, event_id) — equal-ts steps
    * chain, earlier steps first) through the transition "step k counts
    * iff k steps are done and its time is >= the last reach time".
    * Because ripe events fold in global event-time order regardless of
    * arrival order or micro-batch split, the folded state is exactly
    * the batch operator's running-min column vector — the in-order
    * replay assumption the pre-r10 form carried is gone, and no state
    * function materializes its per-batch group slice (arrivals stream
    * into the buffer; only the ripe slice — bounded by the watermark
    * window — is ever sorted).
    *
    * Timeout discipline: any group holding a buffer re-arms an
    * event-time timeout just past the current watermark, so the fold
    * resumes whenever the watermark advances even if the user goes
    * quiet. The harness replay closes the stream with the heartbeat
    * sentinel (`harnessEventStreamFlushed`), whose far-future event
    * time drives the final watermark past the whole corpus — every
    * buffer drains and the final depths land on the BATCH funnel's
    * oracle relation exactly. State is O(events within one watermark
    * window) per user plus O(k) folded longs — the delay is the
    * explicit knob trading disorder tolerance for state size; a
    * production deployment additionally sets a retirement TTL for
    * dormant users.
    */
  def streamFunnel(spark: SparkSession, sfDir: String,
                   steps: Seq[String] = Seq("view", "click", "purchase")): DataFrame = {
    val perUser = runToBatch(spark,
      s => funnelDepths(harnessEventStreamFlushed(s, sfDir), steps),
      "stream_funnel", OutputMode.Update())
    // final depth per user (last emission wins = max: depth only grows),
    // unrolled into the cumulative funnel table
    perUser.groupBy("user_id").agg(max(col("depth")).as("depth"))
      .filter(col("depth") > 0)
      .select(explode(sequence(lit(1L), col("depth"))).as("step_idx"))
      .groupBy("step_idx").agg(count(lit(1)).as("n_users"))
      .select(col("step_idx"),
        element_at(array(steps.map(lit(_)): _*), col("step_idx").cast("int")).as("step"),
        col("n_users"))
      .orderBy("step_idx")
  }

  /** The funnel state machine over a prepared (heartbeat-carrying)
    * event stream: emits (user_id, depth) whenever a user's fold
    * advances. Factored out so tests can drive it from their own
    * multi-file out-of-order replays.
    */
  def funnelDepths(events: DataFrame,
                   steps: Seq[String] = Seq("view", "click", "purchase")): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val sidx = steps.zipWithIndex
      .foldLeft(lit(Int.MaxValue)) { case (acc, (s, i)) =>
        when(col("event_type") === s, lit(i)).otherwise(acc)
      }
    val k = steps.length
    events
      .withWatermark("ts", "2 hours")
      // the heartbeat is admitted explicitly: the optimizer may push
      // this filter below the watermark node, and a predicate that
      // dropped the sentinel there would freeze the watermark
      .filter(col("event_type").isin(steps.map(st => st: Any): _*) ||
        col("user_id") === lit(heartbeatUserId))
      // ts rides along untouched: the watermark tag lives on that
      // attribute and the stateful operator requires it in its input
      .select(col("user_id"), sidx.cast("int").as("sidx"),
        unix_micros(col("ts")).as("tus"), col("event_id"), col("ts"))
      .as[FunnelEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, rows: Iterator[FunnelEvent], state: GroupState[FunnelOooState]) =>
          if (uid == heartbeatUserId) { rows.foreach(_ => ()); Iterator.empty }
          else {
            val wm = state.getCurrentWatermarkMs()
            val st = state.getOption.getOrElse(FunnelOooState(Nil, Nil))
            val (ripe, pending) = splitRipe[FunnelEvent](st.buf, rows, wm, _.tus)
            val reach = ripe.sortBy(e => (e.tus, e.sidx, e.event_id))
              .foldLeft(st.reach) { (r, e) =>
                if (r.length < k && e.sidx == r.length &&
                    (r.isEmpty || e.tus >= r.last)) r :+ e.tus else r
              }
            state.update(FunnelOooState(reach, pending))
            if (pending.nonEmpty) state.setTimeoutTimestamp(wm + 1L)
            if (ripe.nonEmpty) Iterator.single((uid, reach.length.toLong))
            else Iterator.empty
          }
      }
      .toDF("user_id", "depth")
  }

  case class AttrEvent(user_id: Long, tus: Long, event_id: Long, is_purchase: Int,
                       ts: java.sql.Timestamp)
  case class AttrLastView(vt: Long, vid: Long)
  case class AttrOut(purchase_event_id: Long, user_id: Long, purchase_tus: Long,
                     view_event_id: Option[Long], view_tus: Option[Long],
                     lag_us: Option[Long])

  case class AttrOooState(last: Option[AttrLastView], buf: List[AttrEvent])

  /** stream_attribution: last-touch attribution AT INGEST — the
    * streaming twin of EventWindows.asOfAttribution, OUT-OF-ORDER
    * TOLERANT via the same watermark-buffered EventTimeTimeout machine
    * as streamFunnel: arrivals buffer in state until the watermark
    * passes them, then fold in the batch total order (tus,
    * views-before-purchases, event_id) — views update the carried
    * last-view, purchases emit their attribution row, including the
    * no-prior-view case with NULL view columns (the batch relation
    * keeps those purchases, so the twin must too). Folded state beyond
    * the buffer is still the ONE last view — O(1) — and the buffer is
    * bounded by the watermark window; emission is exactly-once per
    * purchase (Append mode), deferred by at most the watermark delay —
    * the standard correctness/latency trade of event-time processing.
    * The harness heartbeat drives the final watermark past the corpus
    * so the run lands on ev_asof_attribution's whole-corpus oracle.
    */
  def streamAttribution(spark: SparkSession, sfDir: String): DataFrame = {
    runToBatch(spark,
        s => attributionRows(harnessEventStreamFlushed(s, sfDir)),
        "stream_attribution", OutputMode.Append())
      .orderBy("purchase_event_id")
  }

  /** The attribution state machine over a prepared (heartbeat-carrying)
    * event stream; factored out for out-of-order replay tests.
    */
  def attributionRows(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", "2 hours")
      .filter(col("event_type").isin("view", "purchase") ||
        col("user_id") === lit(heartbeatUserId))
      .select(col("user_id"), unix_micros(col("ts")).as("tus"),
        col("event_id"),
        (col("event_type") === "purchase").cast("int").as("is_purchase"),
        col("ts"))
      .as[AttrEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, rows: Iterator[AttrEvent], state: GroupState[AttrOooState]) =>
          if (uid == heartbeatUserId) { rows.foreach(_ => ()); Iterator.empty }
          else {
            val wm = state.getCurrentWatermarkMs()
            val st = state.getOption.getOrElse(AttrOooState(None, Nil))
            val (ripe, pending) = splitRipe[AttrEvent](st.buf, rows, wm, _.tus)
            var lv = st.last
            val out = Seq.newBuilder[AttrOut]
            ripe.sortBy(e => (e.tus, e.is_purchase, e.event_id)).foreach { e =>
              if (e.is_purchase == 0) lv = Some(AttrLastView(e.tus, e.event_id))
              else out += AttrOut(e.event_id, uid, e.tus,
                lv.map(_.vid), lv.map(_.vt), lv.map(v => e.tus - v.vt))
            }
            state.update(AttrOooState(lv, pending))
            if (pending.nonEmpty) state.setTimeoutTimestamp(wm + 1L)
            out.result().iterator
          }
      }
      .toDF()
  }

  case class TransEvent(user_id: Long, tus: Long, event_id: Long, event_type: String,
                        ts: java.sql.Timestamp)
  case class TransLast(tus: Long, event_id: Long, tpe: String)

  case class TransOooState(last: Option[TransLast], buf: List[TransEvent])

  /** Streaming Markov transitions — the ingest-time twin of
    * EventWindows.eventTransitions, OUT-OF-ORDER TOLERANT via the same
    * watermark-buffered EventTimeTimeout machine as streamFunnel:
    * arrivals buffer in state until the watermark passes them, then
    * the ripe slice is folded in the batch operator's total order
    * (tus, event_id), zipped against the carried last-seen event, and
    * one (prev_type, next_type) pair is emitted per consecutive step;
    * the pairs accumulate in the sink and the harness collapses them
    * to the same counts + integral ppm row-rate table the batch
    * operator produces, so the two share one oracle (the heartbeat
    * sentinel drives the final watermark past the corpus so every
    * buffer drains). Folded state beyond the buffer is O(1) per user —
    * one (long, long, string) regardless of history length — and the
    * buffer is bounded by the watermark window, the explicit
    * disorder-tolerance/state-size knob.
    */
  def streamTransitions(spark: SparkSession, sfDir: String): DataFrame = {
    val emitted = runToBatch(spark,
      s => transitionPairs(harnessEventStreamFlushed(s, sfDir)),
      "stream_transitions", OutputMode.Update())
    emitted.groupBy("prev_type", "next_type")
      .agg(count(lit(1)).as("n"))
      .withColumn("row_total",
        sum(col("n")).over(org.apache.spark.sql.expressions.Window.partitionBy("prev_type")))
      .select(col("prev_type"), col("next_type"), col("n"),
        expr("(1000000 * n) div row_total").as("rate_ppm"))
      .orderBy("prev_type", "next_type")
  }

  /** The transition state machine over a prepared (heartbeat-carrying)
    * event stream: emits one (prev_type, next_type) pair per
    * consecutive ripe step; factored out for out-of-order replay tests.
    */
  def transitionPairs(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", "2 hours")
      .select(col("user_id"), unix_micros(col("ts")).as("tus"),
        col("event_id"), col("event_type"), col("ts"))
      .as[TransEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, rows: Iterator[TransEvent], state: GroupState[TransOooState]) =>
          if (uid == heartbeatUserId) { rows.foreach(_ => ()); Iterator.empty }
          else {
            val wm = state.getCurrentWatermarkMs()
            val st = state.getOption.getOrElse(TransOooState(None, Nil))
            val (ripe, pending) = splitRipe[TransEvent](st.buf, rows, wm, _.tus)
            val seq = st.last
              .map(l => TransEvent(uid, l.tus, l.event_id, l.tpe, null))
              .toList ++ ripe.sortBy(e => (e.tus, e.event_id))
            val last = seq.lastOption.map(e =>
              TransLast(e.tus, e.event_id, e.event_type)).orElse(st.last)
            state.update(TransOooState(last, pending))
            if (pending.nonEmpty) state.setTimeoutTimestamp(wm + 1L)
            seq.iterator.zip(seq.iterator.drop(1))
              .map { case (a, b) => (a.event_type, b.event_type) }
          }
      }
      .toDF("prev_type", "next_type")
  }

  /** Ingest-time mix sampling — the streaming twin of Corpus.mixSample,
    * sharing its expressions AND its oracle: the sampler is a
    * STATELESS hash decision, so the stream form needs no state store,
    * no watermark, and no dedup on restart — re-delivered rows make the
    * same decision, which is the whole argument for hash coins over RNG
    * at ingest. Only the audit rollup (Complete mode, one row per
    * source) is stateful, and it is bounded by source count.
    */
  def streamMixSample(spark: SparkSession, sfDir: String): DataFrame =
    runToBatch(spark,
        s => harnessDocStream(s, sfDir)
          .select(col("source"), graft.ops.Corpus.mixRate.as("rate_milli"),
            (graft.ops.Corpus.mixToss < graft.ops.Corpus.mixRate).as("keep"))
          .groupBy("source", "rate_milli")
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept")),
        "stream_mix", OutputMode.Complete())
      .withColumn("achieved_milli",
        (col("n_kept") * 1000L / col("n_docs")).cast("long"))
      .orderBy("source")

  /** Stateless ingest-time deny-list scrub — the streaming twin of
    * text_scrub: redaction is a pure per-row map, so the micro-batch
    * plan IS the batch plan (graft.ops.TextAnalysis.scrubFrame) with no
    * state store at all — the cheapest kind of streaming operator, and
    * the shape a production ingest path runs redaction in (scrub
    * before anything persists the raw text).
    */
  def streamScrub(spark: SparkSession, sfDir: String): DataFrame =
    runToBatch(spark,
        s => graft.ops.TextAnalysis.scrubFrame(harnessDocStream(s, sfDir)),
        "stream_scrub", OutputMode.Append())
      .orderBy("doc_id")

  /** Stateless ingest-time PII redaction — the streaming twin of
    * text_pii: detection + masking is a pure per-row regex projection,
    * so the micro-batch plan IS the batch plan with no state store.
    * This is the one stage a production ingest MUST run at the stream
    * head — PII has to be gone before the raw crawl persists anywhere,
    * which is exactly why the operator needs a streaming form at all.
    */
  def streamPii(spark: SparkSession, sfDir: String): DataFrame =
    runToBatch(spark,
        s => graft.ops.TextAnalysis.piiFrame(
          graft.ops.TextAnalysis.piiInjected(harnessDocStream(s, sfDir))),
        "stream_pii", OutputMode.Append())
      .orderBy("doc_id")

  /** Stateless ingest-time scene segmentation — the streaming twin of
    * mm_scenes. All of a media item's frames arrive in its ONE payload
    * row, so the in-row sceneFrame formulation (array HOFs, no window)
    * makes cut detection and the per-scene rollup a pure per-row
    * projection: no state store, no shuffle, O(1) memory per row at
    * any stream rate. Shares mm_scenes' oracle — the window form and
    * the in-row form are row-for-row equal (MultimodalSpec pins it).
    */
  def streamScenes(spark: SparkSession, sfDir: String): DataFrame =
    runToBatch(spark,
        s => graft.ops.Multimodal.sceneFrame(
          graft.ops.Multimodal.mediaFrame(harnessDocStream(s, sfDir))),
        "stream_scenes", OutputMode.Append())
      .orderBy("id", "scene_idx")

  /** Stateless ingest-time quality-classifier scoring — the streaming
    * twin of text_classifier; same zero-state per-row fold.
    */
  def streamClassifier(spark: SparkSession, sfDir: String): DataFrame =
    runToBatch(spark,
        s => graft.ops.TextAnalysis.classifierFrame(harnessDocStream(s, sfDir)),
        "stream_classifier", OutputMode.Append())
      .orderBy("doc_id")

  /** Stateless ingest-time DSIR scoring — the streaming twin of
    * mix_dsir, in the production serving shape: the <= 1024-row
    * target/corpus ratio dimension is materialized from the BATCH
    * corpus (at 100 TB: once per target domain), pulled to the driver
    * (bounded by construction — the same fixed-size-pull discipline as
    * the decontamination Bloom sketch) and shipped inside the plan as a
    * map literal, so arriving documents score through a narrow per-row
    * token fold: no join, no shuffle, no state on the stream side.
    */
  /** stream_seasonal: seasonality-conditioned anomaly flagging AT
    * INGEST — the streaming twin of EventWindows.seasonalAudit's
    * scoring half, in the production shape: the bounded
    * (|types| x 24)-row hour-of-day baseline is built batch-side (a
    * seasonal profile refreshes per snapshot, not per event) and rides
    * the plan as a broadcast stream-static join, so each arriving
    * held-out event scores in flight — no stream-side shuffle, no
    * state store, Append mode. The batch relation over the same
    * held-out split is the oracle.
    */
  def streamSeasonal(spark: SparkSession, sfDir: String): DataFrame = {
    val base = graft.ops.EventWindows.seasonalBaseline(spark, sfDir)
      .collect().toSeq
    runToBatch(spark,
        s => {
          import s.implicits._
          val baseDf = base.map(r =>
            (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
            .toDF("event_type", "hod", "n_train", "baseline_milli")
          graft.ops.EventWindows.seasonalScoreFrame(
            harnessEventStream(s, sfDir), baseDf)
        },
        "stream_seasonal", OutputMode.Append())
      .orderBy("event_id")
  }

  /** stream_manifest: the per-source integrity manifest maintained AT
    * INGEST — the publish-side half of Corpus.sourceManifest's
    * story: because the content checksum is a COMMUTATIVE modular sum,
    * it is exactly the shape Complete-mode streaming state merges
    * without ordering concerns (the same mergeability argument as the
    * HLL sketch profiles), so the manifest a transfer validates
    * against is always current as documents arrive. Shares the batch
    * oracle.
    */
  def streamManifest(spark: SparkSession, sfDir: String): DataFrame =
    runToBatch(spark,
        s => manifestFrame(harnessDocStream(s, sfDir)),
        "stream_manifest", OutputMode.Complete())
      .orderBy("source")

  /** The manifest aggregation over a prepared document stream — every
    * accumulator commutative (count, sum, modular h60 sum), so the
    * result is micro-batch-split invariant; factored out so the
    * boundary-invariance replay spec can drive it under different
    * file-to-batch splits.
    */
  private[graft] def manifestFrame(docs: DataFrame): DataFrame =
    docs
      .select(col("source"), col("n_chars"),
        graft.functions.OracleHash.h60(col("text")).as("h"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars"),
        expr("cast(sum(cast(h as decimal(38,0))) % 2305843009213693952 as bigint)")
          .as("content_sum"))

  /** stream_rfm: the RFM feature store maintained AT INGEST — the
    * streaming twin of EventWindows.rfmFeatures in the feature-store
    * serving shape: per-user (last day, frequency, monetary) state
    * lives in one Complete-mode aggregation that every arrival
    * updates, so the model-serving read is always current; the
    * recency/churn derivation against the corpus max day is a
    * stateless projection on the result (the max day is a batch-side
    * 1-row pull — the DSIR fixed-size-artifact discipline — because a
    * streaming global max would chain a second stateful aggregation
    * for a constant). Shares ev_rfm's oracle.
    */
  def streamRfm(spark: SparkSession, sfDir: String, churnDays: Int = 90): DataFrame = {
    val maxDay = graft.GraftSession.table(spark, sfDir, "events")
      .agg(max(expr("(ts div 1000000000) div 86400"))).head().getLong(0)
    runToBatch(spark,
        s => rfmStateFrame(harnessEventStream(s, sfDir)),
        "stream_rfm", OutputMode.Complete())
      .select(col("user_id"),
        (lit(maxDay) - col("last_day")).as("recency_days"),
        col("frequency"), col("monetary_milli"),
        (lit(maxDay) - col("last_day") > churnDays.toLong).as("churned"))
      .orderBy("user_id")
  }

  /** The per-user RFM state aggregation over a prepared event stream —
    * max/count/conditional-sum accumulators, all commutative, so the
    * state is micro-batch-split invariant; factored out for the
    * boundary-invariance replay spec.
    */
  private[graft] def rfmStateFrame(events: DataFrame): DataFrame =
    events
      .select(col("user_id"), col("event_type"),
        expr("(unix_micros(ts) div 1000000) div 86400").as("day"),
        floor(col("value") * 1000d).cast("long").as("v_milli"))
      .groupBy("user_id")
      .agg(max(col("day")).as("last_day"),
        count(lit(1)).as("frequency"),
        sum(when(col("event_type") === "purchase", col("v_milli"))
          .otherwise(0L)).as("monetary_milli"))

  def streamDsir(spark: SparkSession, sfDir: String): DataFrame = {
    val ratio = graft.ops.Corpus.dsirRatioTable(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    runToBatch(spark,
        s => graft.ops.Corpus.dsirScoreFrame(harnessDocStream(s, sfDir), ratio),
        "stream_dsir", OutputMode.Append())
      .orderBy("doc_id")
  }

  /** stream_decontaminate_semantic: ingest-time embedding-space leak
    * gate — the streaming twin of Similarity.semanticDecontaminate, in
    * the production serving shape: the <= 50-vector eval benchmark is
    * pulled once from the batch side (bounded by the benchmark's
    * ABSOLUTE size — the same fixed-size-pull discipline as the DSIR
    * ratio map and the Bloom sketch) and unrolled into the plan, so
    * each arriving embedding scores through one stateless narrow
    * projection: no join, no shuffle, no state store. This is the gate
    * that keeps paraphrased eval leakage out of a continuously-ingested
    * corpus — it must run per arrival, which is exactly why the
    * unrolled form exists.
    */
  def streamSemanticDecontaminate(spark: SparkSession, sfDir: String): DataFrame = {
    val eval = graft.ops.Similarity.evalVectors(spark, sfDir)
    runToBatch(spark,
        s => graft.ops.Similarity.semanticDeconFrame(
          harnessEmbStream(s, sfDir).filter(col("vec_id") % 97 =!= 0),
          eval, 400L),
        "stream_semdecon", OutputMode.Append())
      .orderBy("doc_id")
  }

  /** stream_distill: ingest-time distilled-quality scoring — the
    * streaming twin of mix_distill's SERVING half, in the production
    * shape: the linear student's coefficients are fitted on the BATCH
    * corpus (exact-rational Cramer solve; at 100 TB, refit on a
    * bounded sample per corpus snapshot), pulled to the driver as ONE
    * row (the same fixed-size-collect discipline as the DSIR ratio
    * map) and shipped into the plan as decimal literals — each
    * arriving document then scores in one stateless narrow projection:
    * no join, no shuffle, no state store. This is exactly why the
    * distillation exists: the teacher's bigram join cannot run at
    * ingest; the student can.
    */
  def streamDistill(spark: SparkSession, sfDir: String): DataFrame = {
    val coeffs = graft.ops.Corpus.distillCoeffStrings(spark, sfDir)
    runToBatch(spark,
        s => graft.ops.Corpus.distillScoreFrame(harnessDocStream(s, sfDir), coeffs),
        "stream_distill", OutputMode.Append())
      .orderBy("doc_id")
  }

  /** stream_bm25: BM25 percolation at ingest — arriving documents are
    * scored against the STORED query workload (the Elasticsearch
    * percolator pattern: queries are the index, documents are the
    * probes), the routing/alerting feed that pairs with batch
    * retrieval ([[graft.ops.TextAnalysis.bm25TopK]]). The per-query-
    * term idf dimension and (tot, n_docs) scalars are batch-side
    * artifacts (bounded by the workload, the sanctioned literal-dim
    * discipline); each arriving doc then scores in ONE stateless
    * narrow projection — no stream-side join, no shuffle, no state.
    * Shares the batch scorer's oracle CTE minus the top-k: the stream
    * emits every (doc, query) match, ranking is the reader's concern.
    */
  def streamBm25(spark: SparkSession, sfDir: String): DataFrame = {
    val (qdim, tot, nDocs) = graft.ops.TextAnalysis.bm25Artifacts(
      spark, sfDir, graft.ops.TextAnalysis.defaultBm25Workload(spark, sfDir))
    runToBatch(spark,
        s => graft.ops.TextAnalysis.bm25PercolateFrame(
          harnessDocStream(s, sfDir), qdim, tot, nDocs),
        "stream_bm25", OutputMode.Append())
      .orderBy("doc_id", "query_id")
  }

  /** stream_substring: ingest-time span-duplication scoring against
    * the HISTORICAL window store — the streaming probe half of
    * dedup_substring_refresh: an arriving doc's n-token windows are
    * flagged iff they already occur in the persisted store (built here
    * from the % mod != 0 split, the "yesterday" discipline of
    * stream_dedup_incremental); within-batch duplication is the batch
    * fold-in's concern. Per-doc distinct windows come from
    * array_distinct BEFORE the explode (stateless, no
    * dropDuplicates state), the store probe is a stream-static left
    * join on the bucketed side, and only the per-doc rollup is
    * stateful (Complete mode, one row per arriving doc — the oracle
    * twin caveat of the other Complete twins).
    *
    * Output: (doc_id, n_windows, n_hist_dup, dup_milli) for arriving
    * (doc_id % mod == 0) docs with >= n tokens, ordered by doc_id.
    */
  def streamSubstringProbe(spark: SparkSession, sfDir: String,
                           n: Int = 8, mod: Int = 4,
                           nBuckets: Int = 8): DataFrame =
    runToBatch(spark,
        s => {
          val name =
            graft.sources.Bucketed.scopedName(s, "graft_window_store_stream")
          // the history window-count frame is the store-served artifact
          // shared with dedup_substring_refresh (VERDICT r14 #4); only
          // the cheap bucket write below is per-invocation
          val hist = graft.ops.Dedup.histWindowCounts(s, sfDir, n, mod)
          graft.sources.Bucketed.writeBucketed(s, hist, name,
            graft.sources.Bucketed.scopedPath(name), "w", nBuckets)
          val idx = s.table(name).select(col("w"), lit(1L).as("hit"))
          harnessDocStream(s, sfDir)
            .filter(col("doc_id") % mod === 0)
            .select(col("doc_id"), explode(array_distinct(
              graft.functions.ShingleColumns.wordShingles(col("text"), n))).as("shingle"))
            .select(col("doc_id"),
              graft.functions.OracleHash.h60(col("shingle")).as("w"))
            .join(idx, Seq("w"), "left")
            .groupBy("doc_id")
            .agg(count(lit(1)).as("n_windows"),
              sum(coalesce(col("hit"), lit(0L))).as("n_hist_dup"))
        },
        "stream_substring", OutputMode.Complete())
      .select(col("doc_id"), col("n_windows"), col("n_hist_dup"),
        expr("(1000 * n_hist_dup) div n_windows").as("dup_milli"))
      .orderBy("doc_id")

  /** stream_profile_fold: the streaming half of the persisted-profile
    * loop — each micro-batch's (source, shard) HLL sketches are
    * appended to the SAME bucketed store corpus_profile_refresh serves
    * from, via foreachBatch + appendBucketed (the exactly-the-batch
    * write discipline of streamWriteHashShards). This is how the store
    * stays current in production: ingest folds sketches in
    * continuously, the daily stats rollup reads co-located buckets,
    * and compaction (corpus_profile_compact) reclaims the per-batch
    * redundancy — none of which is possible with exact distinct state.
    * The emitted audit excludes the store's row count (micro-batch
    * boundaries are not deterministic) and gates the union against
    * exact count_distinct over the same files.
    *
    * Output: (source, n_tokens, n_distinct_exact,
    * union_within_tolerance), ordered by source.
    */
  def streamProfileFold(spark: SparkSession, sfDir: String,
                        shards: Int = 8, lgK: Int = 12, tol: Double = 0.05,
                        nBuckets: Int = 8): DataFrame = {
    val name =
      graft.sources.Bucketed.scopedName(spark, "graft_profile_store_stream")
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val q = harnessDocStream(spark, sfDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val sk = graft.ops.Corpus.shardSketchesOf(batch, shards, lgK)
        if (!spark.catalog.tableExists(name))
          graft.sources.Bucketed.writeBucketed(spark, sk, name,
            graft.sources.Bucketed.scopedPath(name), "source", nBuckets)
        else
          graft.sources.Bucketed.appendBucketed(spark, sk, name, "source", nBuckets)
        ()
      }
      .option("checkpointLocation", // scratch ckpt, see runToMemory (r18)
        s"${scratchRoot(spark)}/${freshName("ckpt_profile_fold")}")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination() // see runToMemory: trailing-batch-safe drain
    def toks(df: DataFrame): DataFrame =
      df.select(col("source"),
        explode(filter(split(col("text"), " "), t => length(t) > 0)).as("token"))
    val merged = spark.table(name).groupBy("source")
      .agg(sum(col("n")).cast("long").as("n_tokens"),
        hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
    val exact = toks(graft.GraftSession.table(spark, sfDir, "documents"))
      .groupBy("source")
      .agg(count_distinct(col("token")).as("nd"))
    merged.join(exact, Seq("source"))
      .select(col("source"), col("n_tokens"), col("nd").as("n_distinct_exact"),
        (abs(col("est") - col("nd")) <= col("nd") * lit(tol))
          .as("union_within_tolerance"))
      .orderBy("source")
  }

  /** stream_json_sink: ingest-time JSON-lines FILE sink — the
    * streaming twin of src_json_roundtrip. Each micro-batch appends
    * its rows as JSON-lines files under a run-scoped directory
    * (foreachBatch + append: the at-least-once file-sink discipline a
    * raw-crawl landing zone runs); after the stream drains, the
    * directory is read back through the schema-pinned json source and
    * profiled — sharing the batch oracle, so the gate proves the
    * streamed files carry EXACTLY the corpus (no dropped batch, no
    * mangled escape, no duplicated write under AvailableNow replay).
    */
  def streamJsonSink(spark: SparkSession, sfDir: String): DataFrame = {
    val path = graft.sources.Bucketed.scopedPath(
      graft.sources.Bucketed.scopedName(spark, "graft_jsonl_stream")) + "/documents"
    val fs = new java.io.File(path)
    if (fs.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      rm(fs)
    }
    val q = harnessDocStream(spark, sfDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write.mode("append").json(path); ()
      }
      .option("checkpointLocation", // scratch ckpt, see runToMemory (r18)
        s"${scratchRoot(spark)}/${freshName("ckpt_json_sink")}")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination() // see runToMemory: trailing-batch-safe drain
    val schema = graft.GraftSession.table(spark, sfDir, "documents").schema
    graft.sources.JsonLines.profile(spark.read.schema(schema).json(path))
  }

  /** stream_best_rep: ingest-time quality-aware dedup — the streaming
    * twin of Dedup.bestRep, via the SAME aggregate core: the per-key
    * argmax is a max(struct) accumulator, so it runs unchanged as a
    * Complete-mode streaming aggregation whose state is ONE struct per
    * distinct content key — a later, better variant of already-seen
    * content replaces the kept one in state, which no first-wins
    * dropDuplicates form can do. Like stream_dedup, this unbounded-key
    * form is the oracle twin; production bounds eviction with the
    * streamExactDedupBounded watermark discipline.
    */
  def streamBestRep(spark: SparkSession, sfDir: String): DataFrame =
    runToBatch(spark,
        s => graft.ops.Dedup.bestRepFrame(harnessDocStream(s, sfDir)),
        "stream_best_rep", OutputMode.Complete())
      .orderBy("keep_doc_id")

  /** stream_sketch_profile: ingest-time cardinality monitoring — the
    * streaming twin of corpus_sketch_profile's union level. Per-source
    * token counts AND a Datasketches HLL sketch accumulate in the
    * Complete-mode aggregation state: ONE fixed-size sketch per source,
    * merged across micro-batches by the streaming aggregation itself —
    * which is the whole point: exact distinct state grows with the
    * token vocabulary (and a streaming distinct under a rollup is
    * unsupported anyway, the canonical-host twin's lesson), while the
    * sketch keeps per-key state at 2^lgK bytes forever. The batch gate
    * then verifies the final sketch against exact count_distinct over
    * the same files (the corpus_sketch_profile audit discipline) and
    * surfaces the boolean the oracle expects TRUE.
    *
    * Output: (source, n_tokens, union_within_tolerance), ordered by
    * source.
    */
  def streamSketchProfile(spark: SparkSession, sfDir: String,
                          lgK: Int = 12, tol: Double = 0.05): DataFrame = {
    def toks(df: DataFrame): DataFrame =
      df.select(col("source"),
        explode(filter(split(col("text"), " "), t => length(t) > 0)).as("token"))
    val streamed = runToBatch(spark,
        s => toks(harnessDocStream(s, sfDir))
          .groupBy("source")
          .agg(count(lit(1)).as("n_tokens"),
            hll_sketch_agg(col("token"), lit(lgK)).as("sk")),
        "stream_sketch", OutputMode.Complete())
    val exact = toks(graft.GraftSession.table(spark, sfDir, "documents"))
      .groupBy("source")
      .agg(count_distinct(col("token")).as("nd"))
    streamed.join(exact, Seq("source"))
      .select(col("source"), col("n_tokens").cast("long").as("n_tokens"),
        (abs(hll_sketch_estimate(col("sk")) - col("nd")) <=
          col("nd") * lit(tol)).as("union_within_tolerance"))
      .orderBy("source")
  }

  /** stream_hot_users: windowed hot-key monitoring at ingest — the
    * streaming analog of rel_skew_audit: per 1 h event-time window, the
    * top-k users by event count, emitted exactly once when the
    * watermark closes the window. This is the alerting feed a 100 TB
    * ingest runs to catch hot keys BEFORE they skew downstream joins.
    *
    * Plan shape — a CHAINED stateful pipeline (two streaming
    * aggregations, the multi-stateful-operator path Spark supports in
    * append mode): per-(window, user) counts first (state bounded by
    * watermark delay x active keys), then a window-on-window
    * re-aggregation via `window_time` into the bounded top-k aggregate
    * (TopKTagAgg: k-entry buffers merge map-side, so the second agg's
    * state is k entries per window, NOT a per-user row set — the
    * monitor's state is O(k) per window regardless of key cardinality).
    * Both stages evict on the same watermark; windows still open at end
    * of input are never emitted (the append discipline of the other
    * *_append twins). Ties break by the tag STRING ascending (the
    * aggregate's total order), which the oracle mirrors with a VARCHAR
    * cast.
    *
    * Output: (win_start, user_id, n, rk), rk = 1..k, ordered.
    */
  def streamHotUsers(spark: SparkSession, sfDir: String, k: Int = 3): DataFrame =
    runToBatch(spark, s => {
        val perUser = harnessEventStream(s, sfDir)
          .withWatermark("ts", "2 hours")
          .groupBy(window(col("ts"), "1 hour"), col("user_id"))
          .agg(count(lit(1)).as("n"))
        perUser
          .groupBy(window(window_time(col("window")), "1 hour"))
          .agg(graft.functions.TopKSketch.topK(col("n"),
            col("user_id").cast("string"), k).as("top"))
      }, "stream_hot_users", OutputMode.Append())
      .select(unix_timestamp(col("window.start")).as("win_start"),
        posexplode(col("top")).as(Seq("i", "t")))
      .select(col("win_start"), col("t.tag").cast("long").as("user_id"),
        col("t.n").as("n"), (col("i") + 1).cast("long").as("rk"))
      .orderBy("win_start", "rk")

  /** Stateless ingest-time BPE tokenization — the streaming twin of
    * vocab_bpe_encode: merges trained on the BATCH corpus (m bounded
    * one-row driver actions), then arriving docs encode through the
    * same literal-merge narrow projection. This is how a production
    * ingest path tokenizes: the tokenizer is a broadcast artifact, the
    * stream never shuffles.
    */
  def streamBpeEncode(spark: SparkSession, sfDir: String): DataFrame = {
    val merges = graft.ops.TextAnalysis.bpeTrainMerges(spark, sfDir, 3)
    // note on ingest parallelism: a file-source micro-batch's task
    // count follows the arriving FILE LAYOUT (one single-row-group file
    // = one task), so a compute-heavy per-row stage must either be
    // cheap enough per row or explicitly repartition the batch. The
    // encode used to be the former problem (an interpreted per-word
    // array fold, 6.5 CPU-s at sf0.1, serialized on one core here —
    // measured 7.5 s vs the 0.84 s batch twin) and is now codegen'd
    // native replaces (see bpeEncodeFrame), so no rebalance shuffle is
    // needed; stateless append, no shuffle at all.
    runToBatch(spark,
        s => graft.ops.TextAnalysis.bpeEncodeFrame(harnessDocStream(s, sfDir), merges),
        "stream_bpe_encode", OutputMode.Append())
      .orderBy("doc_id")
  }

  /** Streaming shard sink — the ingest-time twin of Corpus.writeShards:
    * each micro-batch is appended to parquet partitioned by shard, via
    * foreachBatch (the sink escape hatch for writers the built-in sinks
    * can't express; here: partitioned append). A global token prefix sum
    * doesn't exist on an infinite stream, so the shard key is the
    * deterministic hash bucket (h60(doc_id) mod nShards) — stable under
    * re-ingest, reordering and restarts, which is what a production
    * ingest path wants anyway; batch-time repacking to token budgets
    * (Corpus.shardPlan) then runs per partition. Exactly-once note: the
    * parquet append is idempotent per (batch, file) only via the normal
    * checkpoint/batch-id discipline — a real deployment keys the write
    * on batchId (e.g. writes to a batch-stamped directory, or a
    * transactional table format); the harness runs one AvailableNow
    * pass, where plain append is exact.
    */
  def streamWriteHashShards(spark: SparkSession, sfDir: String, outDir: String,
                            nShards: Int = 8): Unit = {
    val q = harnessDocStream(spark, sfDir)
      .withColumn("shard_id",
        pmod(graft.functions.OracleHash.h60(col("doc_id").cast("string")),
          lit(nShards.toLong)))
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write.mode("append").partitionBy("shard_id").parquet(outDir)
      }
      .option("checkpointLocation", // scratch ckpt, see runToMemory (r18)
        s"${scratchRoot(spark)}/${freshName("ckpt_hash_shards")}")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination() // see runToMemory: trailing-batch-safe drain
  }

  /** LEFT OUTER stream-stream interval join — `streamViewPurchaseJoin`
    * with the unmatched purchases surfaced as NULL attribution rows (the
    * funnel-analysis form: every purchase, attributed or not). Outer
    * emission is WATERMARK-DRIVEN state eviction: a purchase row waits
    * in state while a matching view could still arrive, and emits with
    * NULLs only when the watermark passes its join window — so on an
    * open stream the unmatched rows trail by the watermark delay, and
    * under AvailableNow the trailing no-data batches flush every
    * purchase the final watermark (max event time - 2h) proves
    * unmatched; later purchases stay in state unemitted. The harness
    * surfaces matched rows plus the EMITTED unmatched set; the oracle
    * models the boundary explicitly (StreamingSpec pins it on a
    * constructed stream).
    */
  def streamViewPurchaseJoinOuter(spark: SparkSession, sfDir: String): DataFrame = {
    runToBatch(spark,
        s => joinSides(s, sfDir) match { case (purchases, views) =>
          purchases.join(views, expr(
            "user_id = v_user AND v_ts <= p_ts AND v_ts >= p_ts - INTERVAL 1 HOUR"),
            "left_outer")
        },
        "stream_join_outer", OutputMode.Append())
      .select(col("purchase_event_id"), col("user_id"),
        unix_micros(col("p_ts")).as("purchase_tus"),
        col("view_event_id"), unix_micros(col("v_ts")).as("view_tus"))
      .orderBy("purchase_event_id", "view_event_id")
  }

  /** Streaming twin of the attribution cascade: the verdict is a pure
    * per-row map (graft.ops.TextAnalysis.cascadeFrame), so the only
    * state is the Complete-mode (source, verdict) rollup — bounded by
    * |sources| x 8 verdicts regardless of stream length. The report a
    * live ingest dashboard reads.
    */
  def streamCascade(spark: SparkSession, sfDir: String): DataFrame =
    runToBatch(spark,
        s => graft.ops.TextAnalysis.cascadeFrame(harnessDocStreamWide(s, sfDir))
          .groupBy("source", "verdict")
          .agg(count(lit(1)).as("n_docs")),
        "stream_cascade", OutputMode.Complete())
      .orderBy("source", "verdict")

  case class CapArrival(source: String, doc_id: Long)
  case class CapCount(n: Long)

  /** stream_source_cap: per-source ADMISSION CONTROL at ingest — the
    * streaming twin of pipeline_source_cap. A per-source counter in
    * state admits the first k arrivals and silently drops the rest:
    * O(1) state per source regardless of stream length, the gate a
    * crawl frontier applies while the data is still in flight (the
    * batch cap then repacks offline). Same in-order caveat as
    * streamFunnel — per micro-batch the k smallest doc_ids (within the
    * remaining budget) are admitted and the harness file-replay is
    * in-order, so the batch window-rank relation is the oracle.
    *
    * The per-batch selection is a BOUNDED K-MIN FOLD over the group
    * iterator, not a materialize-and-sort: an admission-control
    * operator exists to survive hot sources, so a hot source's
    * million-row micro-batch must cost this task O(batch * log k) time
    * and O(k) memory — a bounded max-heap of candidate ids — never a
    * full in-memory copy of the group. (The previous
    * `rows.toSeq.sortBy` form buffered the source's entire micro-batch
    * on one task — exactly the failure mode the operator guards
    * against.) State stays O(1) per source: just the admitted count.
    *
    * Output: (source, doc_id, rk) for admitted docs only.
    */
  def streamSourceCap(spark: SparkSession, sfDir: String, k: Int = 10): DataFrame = {
    import spark.implicits._
    runToBatch(spark,
        s => harnessDocStream(s, sfDir)
          .select(col("source"), col("doc_id"))
          .as[CapArrival]
          .groupByKey(_.source)
          .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
            (src: String, rows: Iterator[CapArrival], state: GroupState[CapCount]) =>
              var n = state.getOption.map(_.n).getOrElse(0L)
              val budget = math.max(0L, k - n).toInt
              // max-heap of at most `budget` ids: the k smallest of the
              // batch fall out without ever holding the batch
              val heap = scala.collection.mutable.PriorityQueue.empty[Long]
              if (budget > 0) rows.foreach { a =>
                if (heap.size < budget) heap.enqueue(a.doc_id)
                else if (a.doc_id < heap.head) {
                  heap.dequeue(); heap.enqueue(a.doc_id)
                }
              }
              val admitted = heap.toArray.sorted // ascending ids
                .map { (id: Long) => n += 1; (src, id, n) }
              state.update(CapCount(n))
              admitted.iterator
          }
          .toDF("source", "doc_id", "rk"),
        "stream_source_cap", OutputMode.Append())
      .orderBy("source", "rk")
  }

  /** stream_phash: perceptual hashing AT INGEST — the stateless
    * streaming twin of Multimodal.imageAHash (encode + decode + 8x8
    * average hash per arriving image id; no state, no watermark: a
    * pure per-row codec map, which is exactly why image fingerprinting
    * belongs at ingest — each micro-batch's hashes append straight to
    * the store the banded pairing rung probes). Shares mm_phash's
    * oracle: the streamed hash set must equal the batch relation.
    */
  def streamImageAHash(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    runToBatch(spark,
      s => {
        import s.implicits._
        harnessDocStream(s, sfDir)
          .filter(col("doc_id") % 2 === 0)
          .select(col("doc_id")).as[Long]
          .mapPartitions(ids => ids.map(graft.ops.Multimodal.aHashOfId))
          .toDF("id", "width", "height", "ahash_lo", "ahash_hi")
      },
      "stream_phash", OutputMode.Append())
      .orderBy("id")
  }

  case class SampArrival(source: String, doc_id: Long, prio: Long)
  case class SampState(prios: List[Long], ids: List[Long])

  /** stream_sample_weighted: the ingest-time twin of
    * Corpus.weightedSample — maintain each source's k-smallest
    * weighted priorities (u div w, the shared md5 family, computed
    * IN-PLAN before the state operator so the state function never
    * hashes) as documents arrive. Unlike [[streamSourceCap]]'s
    * append-only admission, a later arrival with a smaller priority
    * EVICTS a resident — so state carries the current k (prio, id)
    * winners, still O(k) per source, and each batch's fold is a
    * bounded max-heap pass over the iterator (O(batch * log k) time,
    * O(k) memory — the same hot-source discipline as the cap twin:
    * a million-row micro-batch never materializes on the task).
    *
    * Update-mode emission: each batch re-emits the source's current
    * winner set. The harness rollup ranks ALL emitted rows per source
    * by (prio, id) and keeps k — correct because an eventual winner is
    * emitted in its admission batch and never beaten, and every
    * non-winner emitted earlier ranks strictly worse than the k
    * winners; the final relation is row-identical to the batch
    * sampler's (minus the corpus-total column), so both share one
    * oracle CTE shape.
    *
    * Output: (source, rk, doc_id, prio), rk = 1..min(k, arrivals).
    */
  def streamWeightedSample(spark: SparkSession, sfDir: String,
                           k: Int = 8): DataFrame = {
    import spark.implicits._
    val emitted = runToBatch(spark,
      s => harnessDocStream(s, sfDir)
        .select(col("source"), col("doc_id"),
          greatest(col("n_chars"), lit(1L)).as("w"),
          graft.functions.OracleHash.h60(
            concat(lit("samp:"), col("doc_id").cast("string"))).as("u"))
        .select(col("source"), col("doc_id"), expr("u div w").as("prio"))
        .as[SampArrival]
        .groupByKey(_.source)
        .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
          (src: String, rows: Iterator[SampArrival], state: GroupState[SampState]) =>
            // max-heap of the current k best: worst-of-the-best on top
            val heap = scala.collection.mutable.PriorityQueue.empty[(Long, Long)]
            state.getOption.foreach(st => st.prios.zip(st.ids).foreach(heap.enqueue(_)))
            val lt = Ordering[(Long, Long)].lt _
            rows.foreach { a =>
              if (heap.size < k) heap.enqueue((a.prio, a.doc_id))
              else if (lt((a.prio, a.doc_id), heap.head)) {
                heap.dequeue(); heap.enqueue((a.prio, a.doc_id))
              }
            }
            val winners = heap.toList.sorted
            state.update(SampState(winners.map(_._1), winners.map(_._2)))
            winners.iterator.map { case (p, id) => (src, id, p) }
        }
        .toDF("source", "doc_id", "prio"),
      "stream_sample_weighted", OutputMode.Update())
    val wr = org.apache.spark.sql.expressions.Window.partitionBy("source")
      .orderBy(col("prio").asc, col("doc_id").asc)
    emitted.distinct()
      .withColumn("rk", row_number().over(wr))
      .filter(col("rk") <= k)
      .select(col("source"), col("rk").cast("long").as("rk"),
        col("doc_id"), col("prio"))
      .orderBy("source", "rk")
  }

  /** Final per-user state of the mapGroupsWithState running totals. The
    * memory sink sees one Update row per (user, micro-batch); the final
    * state per user is the row with the highest event count (monotone).
    */
  def streamRunningTotals(spark: SparkSession, sfDir: String): DataFrame =
    runToBatch(spark,
        s => runningUserTotals(s, harnessEventStream(s, sfDir)),
        "stream_running", OutputMode.Update())
      .groupBy("user_id")
      .agg(max(struct(col("n_events"), col("total_value_micros"))).as("f"))
      .select(col("user_id"), col("f.n_events").as("n_events"),
        col("f.total_value_micros").as("total_value_micros"))
      .orderBy("user_id")
}
