package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators over the `events` table shape
  * (event_id, ts, user_id, event_type, value, props).
  *
  * Each operator has a batch-equivalent used by the correctness gate
  * (identical expressions over a static DataFrame), plus the true
  * streaming form (readStream → watermark → agg) exercised in specs
  * via in-memory sinks. Watermarks bound state; tumbling windows are
  * epoch-aligned so batch and stream agree exactly.
  */
object Events {

  /** Tumbling-window aggregation (batch form). `window(ts, w)` with
    * epoch-aligned tumbling windows == date_trunc bucketing, portable
    * to any SQL engine.
    */
  def windowedAggBatch(events: DataFrame, windowLen: String = "1 hour"): DataFrame =
    events.groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value"),
        count_distinct(col("user_id")).as("n_users"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"), col("n_users"))

  /** Streaming form of the same aggregation. */
  def windowedAggStream(events: DataFrame, windowLen: String = "1 hour",
                        watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Batch sessionization: sessions split on inactivity gaps >
    * `gapMinutes`. Classic lag + cumulative-sum-of-boundaries window;
    * one shuffle on user_id. Expressible identically in any
    * window-capable SQL engine (the oracle).
    */
  def sessionizeBatch(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val gapSec = gapMinutes * 60L
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > gapSec, 1L)
          .otherwise(0L))
      .withColumn("session_seq", sum(col("new_session")).over(byUser))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value"))
  }

  /** Run the windowed aggregation as a REAL file-source streaming
    * query (Trigger.AvailableNow → memory sink) and return the final
    * result — the correctness gate compares it to the same DuckDB
    * oracle as the batch form. `rawEvents` must be the raw (long ts)
    * streaming frame; conversion mirrors Tables.events.
    */
  def windowedAggFileStream(spark: SparkSession, sfDir: String,
                            windowLen: String = "1 hour"): DataFrame = {
    val rawSchema = spark.read.parquet(s"$sfDir/events.parquet").schema
    // file streaming sources take a directory; filter to the one table
    val stream = spark.readStream.schema(rawSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
    val events = stream.withColumn("ts",
      timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))
    // distinct aggregates aren't supported on streams; the stream form
    // carries count + sum (the oracle matches this column set)
    val agg = events
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))
    val name = "graft_stream_windows"
    val q = agg.writeStream
      .format("memory").queryName(name)
      .outputMode(OutputMode.Complete())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination() finally q.stop()
    spark.table(name)
  }

  /** Streaming exact dedup: drop events whose (event_id) was already
    * seen, with state bounded by the watermark —
    * `dropDuplicatesWithinWatermark` keeps a key in state only until
    * the watermark passes its event time, so 100 TB/day streams don't
    * accumulate unbounded dedup state.
    */
  def dedupStream(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                   event_type: String, value: Double)
  case class SessionState(start: Long, last: Long, n: Long, sum: Double)
  case class Session(user_id: Long, session_start: java.sql.Timestamp,
                     session_end: java.sql.Timestamp, n_events: Long, sum_value: Double)

  /** Streaming sessionization with explicit state: a session closes
    * either in-batch (a row arrives past the gap) or via EVENT-TIME
    * timeout once the watermark passes `last + gap`. Event-time (not
    * processing-time) timeout keeps results replay-deterministic and
    * lets the engine quiesce between triggers — with a
    * processing-time timeout the query re-triggers forever even with
    * no data. This is the custom-state path Structured Streaming
    * requires when windows can't express the semantics.
    */
  def sessionizeStream(events: Dataset[Event], gapMinutes: Int = 30,
                       watermark: String = "1 hour"): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60 * 1000L
    val gapSec = gapMinutes * 60L
    // the gap compares SECOND-truncated times, matching sessionizeBatch
    // (whose unix_timestamp arithmetic truncates) — sub-second
    // differences must not split sessions in one form but not the other
    def gapExceeded(prevMs: Long, curMs: Long): Boolean =
      curMs / 1000L - prevMs / 1000L > gapSec
    events.withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (userId, rows, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(Session(userId, new java.sql.Timestamp(s.start),
              new java.sql.Timestamp(s.last), s.n, s.sum))
          } else {
            val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var closed = List.empty[Session]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if !gapExceeded(s.last, t) =>
                  cur = Some(SessionState(s.start, t, s.n + 1, s.sum + e.value))
                case Some(s) =>
                  closed ::= Session(userId, new java.sql.Timestamp(s.start),
                    new java.sql.Timestamp(s.last), s.n, s.sum)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + gapMs)
            }
            closed.reverseIterator
          }
      }
  }
}
