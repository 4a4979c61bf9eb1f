package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/** Structured Streaming surface of the engine: the `events` table consumed
  * as a file stream.
  *
  * Two canonical shapes:
  *  - watermarked tumbling-window aggregation in APPEND mode — the
  *    production form: state is bounded by the watermark, late rows beyond
  *    it are dropped, and only finalized windows emit;
  *  - sessionization with `flatMapGroupsWithState` — custom per-key state
  *    with event-time timeout, the escape hatch for semantics windows can't
  *    express.
  *
  * Scale: both are shuffle-on-key stateful operators; state lives in the
  * state store per partition and is bounded by watermark/timeout, so
  * executor memory is O(active keys), not O(history).
  *
  * Deployment note: `GraftSession.build` disables
  * `spark.sql.streaming.noDataMicroBatches` because the driver contract
  * replays finitely. A CONTINUOUS deployment of these append-mode shapes
  * should re-enable it (the default) on its session — idle-period no-data
  * batches are what advance the watermark to finalize windows and fire
  * event-time timeouts when input pauses.
  */
object EventStream {

  /** Hourly windowed counts/sums per event_type with a watermark. Append
    * mode: a window emits once the watermark passes its end.
    */
  def windowedAgg(stream: DataFrame, watermark: String = "2 hours"): DataFrame =
    stream
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
        col("event_type"), col("n"), col("total"))

  final case class SessionUpdate(
      user_id: Long, n_events: Long, total_value: Double, closed: Boolean)

  // public: the state encoder's generated code must construct it
  final case class SessionState(n: Long, total: Double, lastTs: Long)

  /** Per-user sessionization: a session closes after `gapSec` seconds of
    * event-time inactivity. EVENT-time timeout, driven by the watermark —
    * deterministic, and no busy polling (a processing-time timeout makes the
    * engine spin empty micro-batches waiting for wall-clock timers).
    */
  def sessionize(spark: SparkSession, events: DataFrame, gapSec: Long): DataFrame = {
    import spark.implicits._
    val typed = events.withWatermark("ts", "1 hour")
      .select(col("user_id"), col("ts"), col("value"))
      .as[(Long, java.sql.Timestamp, Double)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (user: Long, rows: Iterator[(Long, java.sql.Timestamp, Double)],
         state: GroupState[SessionState]) => {
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionUpdate(user, s.n, s.total, closed = true))
          } else {
            val buf = rows.toSeq
            val prev = state.getOption.getOrElse(SessionState(0L, 0.0, 0L))
            val lastMs = buf.map(_._2.getTime).maxOption.getOrElse(prev.lastTs)
            val next = SessionState(prev.n + buf.size, prev.total + buf.map(_._3).sum, lastMs)
            state.update(next)
            // late data can put lastTs+gap behind the watermark (illegal
            // timer); clamp the timeout just past the watermark instead
            state.setTimeoutTimestamp(
              math.max(lastMs + gapSec * 1000, state.getCurrentWatermarkMs() + 1000))
            Iterator(SessionUpdate(user, next.n, next.total, closed = false))
          }
        }).toDF()
  }

  /** Run a streaming DataFrame until all available source data is processed,
    * then stop, and return the memory-sink result. processAllAvailable +
    * stop (not AvailableNow/awaitTermination): pending processing-time
    * timers would otherwise keep the query alive firing empty micro-batches
    * forever.
    */
  def runToCompletion(
      spark: SparkSession, streamed: DataFrame,
      mode: OutputMode, name: String): DataFrame = {
    val q: StreamingQuery = streamed.writeStream
      .format("memory").queryName(name)
      .outputMode(mode)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }
}
