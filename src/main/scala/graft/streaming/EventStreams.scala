package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators over the `events` stream table.
  *
  * The reference library has no streaming semantics (SURVEY.md section 2.9);
  * these are the engine-side stream operators a geotagged-event pipeline
  * needs: watermarked windowed aggregation and stateful sessionization via
  * `flatMapGroupsWithState`. Every transform works identically on a batch
  * DataFrame and a `readStream` source.
  */
object EventStreams {

  /** Watermarked tumbling-window counts per event type. On a streaming
    * input, late events beyond the watermark are dropped and windows are
    * finalized incrementally. */
  def windowedCounts(events: DataFrame,
                     watermark: String = "10 minutes",
                     windowLength: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLength), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum("value").as("total_value"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"), col("cnt"), col("total_value"))

  /** Watermarked per-tile windowed counts over a geotagged event stream —
    * the streaming form of [[graft.operators.Tiling.tileStats]]. The s2
    * tiling expressions run inside the micro-batch plan (custom Catalyst
    * expressions are streaming-safe: deterministic, codegen'd, stateless),
    * so the only state is the windowed aggregation's, keyed by
    * (window, tile) — bounded by 6*4^level cells times live windows, not
    * by input rate. */
  def tiledWindowCounts(events: DataFrame, latCol: String, lonCol: String,
                        level: Int, watermark: String = "10 minutes",
                        windowLength: String = "1 hour"): DataFrame = {
    import graft.functions.s2functions._
    events
      .withWatermark("ts", watermark)
      .withColumn("tile_token", s2_token(s2_tile(col(latCol), col(lonCol), level)))
      .groupBy(window(col("ts"), windowLength), col("tile_token"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("tile_token"), col("n"))
  }

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                         event_type: String, value: Double)

  final case class SessionState(start: Long, end: Long, nEvents: Int, totalValue: Double)

  final case class Session(user_id: Long, session_start: Timestamp, session_end: Timestamp,
                           n_events: Int, total_value: Double)

  /** Stateful sessionization: consecutive events of a user belong to one
    * session while gaps stay under `gapMillis`.
    * `KeyValueGroupedDataset.flatMapGroupsWithState` is the Spark-native
    * custom-state operator.
    *
    * On a STREAM the open session is kept in state ACROSS micro-batches —
    * a session spanning batches is emitted exactly once — and is flushed
    * only by an event-time timeout: when the watermark (event time minus
    * `watermarkDelay`) passes `session_end + gapMillis`, no in-order event
    * can extend the session any more, so it is final. On a finite batch
    * input (no further data by definition) the trailing session is emitted
    * directly. StreamingSpec feeds one session across two `addData`
    * batches to pin the cross-batch behavior. */
  def sessionize(events: Dataset[Event], gapMillis: Long = 30 * 60 * 1000L,
                 watermarkDelay: String = "10 minutes"): Dataset[Session] = {
    import events.sparkSession.implicits._

    val isStream = events.isStreaming

    def flush(userId: Long, st: SessionState): Session =
      Session(userId, new Timestamp(st.start), new Timestamp(st.end), st.nEvents, st.totalValue)

    val src = if (isStream) events.withWatermark("ts", watermarkDelay) else events
    src
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(),
        if (isStream) GroupStateTimeout.EventTimeTimeout() else GroupStateTimeout.NoTimeout()) {
        case (userId, rows, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // watermark passed end + gap: the open session is final
            val st = state.get
            state.remove()
            Iterator.single(flush(userId, st))
          } else {
            val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            val out = scala.collection.mutable.ArrayBuffer.empty[Session]
            var st = state.getOption.orNull
            for (e <- sorted) {
              val t = e.ts.getTime
              if (st == null) {
                st = SessionState(t, t, 1, e.value)
              } else if (t - st.end > gapMillis) {
                out += flush(userId, st)
                st = SessionState(t, t, 1, e.value)
              } else {
                // min/max, not assignment: a late-but-within-watermark event
                // from a later batch may precede the stored session's bounds;
                // letting it move `end` backward would corrupt session_end
                // and fire the event-time timeout early
                st = SessionState(math.min(st.start, t), math.max(st.end, t),
                  st.nEvents + 1, st.totalValue + e.value)
              }
            }
            if (st != null) {
              if (isStream) {
                state.update(st)
                state.setTimeoutTimestamp(st.end + gapMillis)
              } else {
                // finite input: no later batch can extend the session
                out += flush(userId, st)
                state.remove()
              }
            }
            out.iterator
          }
      }
  }

  /** Batch-mode sessionization with plain window functions — the oracle-able
    * equivalent of [[sessionize]] (gap > threshold starts a new session). */
  def sessionizeBatch(events: DataFrame, gapMillis: Long = 30 * 60 * 1000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val wSess = Window.partitionBy("user_id", "session_id")
    events
      .withColumn("__prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("__new_session",
        when(col("__prev_ts").isNull ||
          col("ts") > col("__prev_ts") + expr(s"INTERVAL $gapMillis MILLISECONDS"), 1)
          .otherwise(0))
      .withColumn("session_id", sum(col("__new_session")).over(w))
      .groupBy("user_id", "session_id")
      .agg(
        min("ts").as("session_start"),
        max("ts").as("session_end"),
        count(lit(1)).as("n_events"),
        round(sum("value"), 2).as("total_value"))
      .drop("session_id")
  }
}
