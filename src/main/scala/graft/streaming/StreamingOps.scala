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
  * file/memory source via `processAllAvailable()`.
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
    */
  def windowedEventCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
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

  case class UserEvent(user_id: Long, event_type: String, value: Double)
  case class UserRunning(user_id: Long, n_events: Long, total_value: Double)

  /** Custom state: running per-user totals via mapGroupsWithState — the
    * escape hatch for state machines the built-in windows can't express.
    */
  def runningUserTotals(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    events.select(col("user_id"), col("event_type"), col("value")).as[UserEvent]
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (uid: Long, evs: Iterator[UserEvent], state: GroupState[UserRunning]) =>
          val prev = state.getOption.getOrElse(UserRunning(uid, 0L, 0.0))
          val (n, v) = evs.foldLeft((prev.n_events, prev.total_value)) {
            case ((cn, cv), e) => (cn + 1, cv + e.value)
          }
          val next = UserRunning(uid, n, v)
          state.update(next)
          next
      }.toDF()
  }

  /** Drive any streaming frame to a memory sink and block until all
    * available input is processed — the local harness for tests.
    */
  def runToMemory(df: DataFrame, queryName: String,
                  mode: OutputMode = OutputMode.Complete()): StreamingQuery = {
    val q = df.writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(mode)
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q
  }
}
