package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface (SURVEY.md §2-B "time/streaming-style"): the
  * batch TimeWindows queries re-expressed as streaming transforms, plus
  * stateful per-key processing. The reference has no streams; this is the
  * engine-surface extension for continuous 100 TB/day ingestion.
  *
  * Each transform takes a (possibly streaming) events DataFrame with columns
  * (event_id long, ts timestamp, user_id long, event_type string, value
  * double) and returns a streaming-safe plan: watermarks bound state, all
  * aggregations are keyed so state partitions by key across executors.
  */
object EventStreams {

  final case class Event(
      event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)

  final case class UserRunning(user_id: Long, n_events: Long, total: Double)

  /** Tumbling 15-minute counts per event type; watermark bounds late data
    * (and thereby state) to 30 minutes.
    */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Session windows (30-minute gap) per user. */
  def userSessions(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("session_window.start").as("sess_start"), col("user_id"),
        col("n_events"), col("sum_value"))

  /** Exactly-once-style dedup by event_id within the watermark horizon —
    * the streaming form of exact dedup (state = one key per id, expired by
    * the watermark instead of growing forever).
    */
  def dedupeEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** Custom keyed state: running per-user totals via mapGroupsWithState
    * (KeyValueGroupedDataset) — the escape hatch for semantics windows can't
    * express. State is partitioned by user_id, so it scales horizontally.
    */
  def runningUserTotals(events: Dataset[Event]): Dataset[UserRunning] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserRunning, UserRunning](
        GroupStateTimeout.NoTimeout()) {
        (uid: Long, it: Iterator[Event], state: GroupState[UserRunning]) =>
          val prev = state.getOption.getOrElse(UserRunning(uid, 0L, 0.0))
          var n = prev.n_events
          var tot = prev.total
          it.foreach { e => n += 1; tot += e.value }
          val next = UserRunning(uid, n, tot)
          state.update(next)
          next
      }
  }
}
