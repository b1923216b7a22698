package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import java.sql.Timestamp

/** Structured Streaming over the events stream: watermarked tumbling-window
  * rollups and stateful gap-based sessionization.
  * (reference: lambda/health_alerts/handler.py — the reference computes
  * hourly rollups and alert sessions in a Lambda poller; here they are
  * declarative streaming plans with event-time watermarks, so late data is
  * handled by the engine and state is bounded.)
  *
  * Both transforms take a DataFrame so they run identically on
  * `readStream` (production) and a MemoryStream (tests): sources are bound
  * outside, logic is source-agnostic — the Spark-idiomatic layering.
  */
object EventStreams {

  /** Watermarked 1-hour tumbling rollup per event_type. Late events beyond
    * 2 h are dropped and their windows finalized — state is bounded by
    * (watermark horizon / window) × |event_type|, independent of stream
    * length.
    */
  def hourlyRollup(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum("value"), 2).as("total_value"),
        approx_count_distinct("user_id").as("approx_users"))
      .select(
        col("window.start").as("hour_start"),
        col("event_type"), col("n_events"), col("total_value"), col("approx_users"))

  /** Native session-window sessionization — the declarative sibling of
    * [[sessionize]]: when per-session state is just aggregates, Spark's
    * built-in `session_window` (30-min gap) is the idiomatic form; reach
    * for flatMapGroupsWithState only when state logic outgrows it.
    */
  def sessionizeNative(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        round(sum("value"), 2).as("total_value"))
      .select(
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"), col("total_value"))

  /** Watermarked exactly-once-per-id dedup: drops re-deliveries of the
    * same event_id arriving within the watermark horizon — the streaming
    * analog of the ingest-time `dedup on id` the reference performs per
    * batch (oura_normalizer read_bronze union+dedup). State is bounded by
    * ids seen inside the horizon.
    */
  def dedupStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")

  case class SessionEvent(user_id: Long, ts: Timestamp, value: Double)
  case class SessionState(start: Long, lastTs: Long, nEvents: Long, total: Double)
  case class SessionOut(user_id: Long, session_start: Timestamp,
                        session_end: Timestamp, n_events: Long, total_value: Double)

  val SessionGapMs: Long = 30 * 60 * 1000L

  /** Gap-based sessionization with flatMapGroupsWithState: a user's events
    * accrue to an open session; 30 min of event-time silence (enforced via
    * event-time timeout against the watermark) closes and emits it. State
    * per key is O(1) — four numbers, not the event list.
    */
  def sessionize(events: Dataset[SessionEvent]): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, it: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            Iterator.single(SessionOut(userId, new Timestamp(st.start),
              new Timestamp(st.lastTs), st.nEvents, math.floor(st.total * 100 + 0.5) / 100))
          } else {
            val evs = it.toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[SessionOut]
            var cur = state.getOption
            evs.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(st) if t - st.lastTs <= SessionGapMs =>
                  // a late-but-valid event (above the watermark) can
                  // precede the current session start — extend both ends
                  cur = Some(st.copy(start = math.min(st.start, t),
                    lastTs = math.max(st.lastTs, t),
                    nEvents = st.nEvents + 1, total = st.total + e.value))
                case Some(st) =>
                  closed ::= SessionOut(userId, new Timestamp(st.start),
                    new Timestamp(st.lastTs), st.nEvents,
                    math.floor(st.total * 100 + 0.5) / 100)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { st =>
              state.update(st)
              state.setTimeoutTimestamp(st.lastTs + SessionGapMs)
            }
            closed.reverseIterator
          }
      }
  }

  /** Production binding: parquet-directory stream → hourly rollup →
    * partitioned parquet sink with checkpointing. Returns the writer so
    * callers control start/stop.
    */
  def rollupQuery(spark: SparkSession, inDir: String, outDir: String,
                  checkpoint: String): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val schema = "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, " +
      "event_type STRING, value DOUBLE, props STRING"
    val src = spark.readStream.schema(schema).parquet(inDir)
    hourlyRollup(src).writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .format("parquet")
      .option("path", outDir)
  }
}
