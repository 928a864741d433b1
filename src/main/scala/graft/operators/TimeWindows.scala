package graft.operators

import graft.{Ora, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Event-time windowing over the `events` table: tumbling, sliding, session
  * (SURVEY.md §2-B "time/streaming-style"). Batch semantics here — the same
  * `window`/`session_window` expressions run unchanged under Structured
  * Streaming with a watermark (see graft.streaming.EventStreams), which is the
  * 100 TB/day ingestion path.
  *
  * Window starts are emitted as epoch seconds (BIGINT) rather than timestamps:
  * the fixture `ts` is nanosecond parquet and epoch arithmetic sidesteps
  * engine-dependent ns->us truncation in timestamp output.
  */
object TimeWindows {
  import Ora._

  /** 15-minute tumbling windows: event count + value sum per window x type. */
  def tumbling(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.events(s, d)
      .groupBy(window($"ts", "15 minutes").as("w"), $"event_type")
      .agg(count(lit(1)).as("n"), dsum($"value").as("sum_value"))
      .select(
        unix_timestamp($"w.start").as("w_start"),
        $"event_type", $"n", $"sum_value")
      .orderBy($"w_start", $"event_type")
  }

  val tumblingSql: String =
    s"""SELECT (CAST(FLOOR(EPOCH(ts) / 900) AS BIGINT) * 900) AS w_start,
       | event_type, COUNT(*) AS n, ${sqlSum("value")} AS sum_value
       |FROM events
       |GROUP BY 1, 2
       |ORDER BY w_start, event_type""".stripMargin

  /** Sliding windows: 1-hour length, 15-minute slide (each event lands in 4
    * windows).
    */
  def sliding(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.events(s, d)
      .groupBy(window($"ts", "1 hour", "15 minutes").as("w"))
      .agg(count(lit(1)).as("n"), davg($"value").as("avg_value"))
      .select(unix_timestamp($"w.start").as("w_start"), $"n", $"avg_value")
      .orderBy($"w_start")
  }

  val slidingSql: String =
    s"""SELECT (CAST(FLOOR(EPOCH(ts) / 900) AS BIGINT) - k) * 900 AS w_start,
       | COUNT(*) AS n, ${sqlAvg("value")} AS avg_value
       |FROM events CROSS JOIN generate_series(0, 3) AS g(k)
       |GROUP BY 1
       |ORDER BY w_start""".stripMargin

  /** Session windows with a 30-minute inactivity gap, per user. Oracle
    * reproduces the half-open session semantics (gap >= 30 min starts a new
    * session) with the gaps-and-islands idiom.
    */
  def sessions(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.events(s, d)
      .groupBy(session_window($"ts", "30 minutes").as("sw"), $"user_id")
      .agg(count(lit(1)).as("n_events"), dsum($"value").as("sum_value"))
      .select(
        $"user_id",
        unix_timestamp($"sw.start").as("sess_start"),
        $"n_events", $"sum_value")
      .orderBy($"user_id", $"sess_start")
  }

  val sessionsSql: String =
    s"""WITH flagged AS (
       |  SELECT user_id, ts, value,
       |    CASE WHEN EPOCH(ts) - EPOCH(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)) >= 1800
       |           OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
       |         THEN 1 ELSE 0 END AS new_sess
       |  FROM events),
       |numbered AS (
       |  SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
       |  FROM flagged)
       |SELECT user_id,
       | CAST(FLOOR(EPOCH(MIN(ts))) AS BIGINT) AS sess_start,
       | COUNT(*) AS n_events, ${sqlSum("value")} AS sum_value
       |FROM numbered
       |GROUP BY user_id, sess_id
       |ORDER BY user_id, sess_start""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q32_win_tumbling" -> (tumbling _),
    "q33_win_sliding"  -> (sliding _),
    "q34_win_session"  -> (sessions _))

  val oracle: Map[String, String] = Map(
    "q32_win_tumbling" -> tumblingSql,
    "q33_win_sliding"  -> slidingSql,
    "q34_win_session"  -> sessionsSql)
}
