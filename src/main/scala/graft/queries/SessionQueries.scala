package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Sessions
import graft.sources.Tables

/** Sessionization tier over `events` — the batch (window-function)
  * formulation; the Structured Streaming twin lives in `graft.streaming`
  * and is covered by MemoryStream tests (no DuckDB oracle for streaming
  * state, SURVEY.md §7.5).
  */
object SessionQueries {

  private val Fmt = "yyyy-MM-dd HH:mm:ss"
  private val OracleFmt = "%Y-%m-%d %H:%M:%S"
  private val GapSeconds = 1800L

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Gap-based sessions per user (30-min inactivity), with per-session
    // rollups. Exact integer microsecond gap comparison.
    "ss_sessionize" -> ((s, d) => {
      val ev = Tables.load(s, d, "events")
      Sessions.sessionStats(
          Sessions.sessionize(ev, "user_id", "ts", "event_id", GapSeconds),
          "user_id", "ts", "value")
        .select(
          col("user_id"), col("session_id"), col("n_events"),
          date_format(col("session_start"), Fmt).as("session_start"),
          date_format(col("session_end"), Fmt).as("session_end"),
          col("sum_value"))
        .orderBy("user_id", "session_id")
    }),

    // Session-length distribution: how many sessions have n events —
    // the shape report a pipeline would alert on.
    "ss_session_sizes" -> ((s, d) => {
      val ev = Tables.load(s, d, "events")
      Sessions.sessionStats(
          Sessions.sessionize(ev, "user_id", "ts", "event_id", GapSeconds),
          "user_id", "ts", "value")
        .groupBy("n_events")
        .agg(count(lit(1)).as("n_sessions"))
        .orderBy("n_events")
    })
  )

  private val SessCte =
    s"""WITH x AS (
       |  SELECT user_id, event_id, ts, value,
       |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
       |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > ${GapSeconds}000000
       |         THEN 1 ELSE 0 END AS nw
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |s AS (
       |  SELECT user_id, ts, value,
       |    sum(nw) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |                  ROWS UNBOUNDED PRECEDING)::BIGINT AS session_id
       |  FROM x),
       |agg AS (
       |  SELECT user_id, session_id, count(*) AS n_events,
       |    strftime(min(ts), '$OracleFmt') AS session_start,
       |    strftime(max(ts), '$OracleFmt') AS session_end,
       |    round(sum(value), 2) AS sum_value
       |  FROM s GROUP BY user_id, session_id)""".stripMargin

  val oracles: Map[String, String] = Map(
    "ss_sessionize" ->
      s"""$SessCte
         |SELECT user_id, session_id, n_events, session_start, session_end, sum_value
         |FROM agg ORDER BY user_id, session_id""".stripMargin,

    "ss_session_sizes" ->
      s"""$SessCte
         |SELECT n_events, count(*) AS n_sessions
         |FROM agg GROUP BY n_events ORDER BY n_events""".stripMargin
  )
}
