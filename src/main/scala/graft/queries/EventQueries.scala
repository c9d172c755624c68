package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-windowed analytics over the events stream table, computed in batch
  * so the DuckDB oracle can check them (SURVEY.md §2.C streaming row — the
  * reference is strictly batch with no time types at all). The same
  * transformations run under Structured Streaming in graft.streaming (where
  * watermarks + state make them incremental); here they prove the window
  * semantics.
  *
  * Window starts are emitted as epoch seconds (BIGINT) — timestamp-typed
  * bucket math is where cross-engine drift lives, epoch integers are exact.
  */
object EventQueries {

  /** Tumbling 10-minute windows: count + sum per (window, event_type).
    * Spark's window() generator and the oracle's epoch arithmetic describe
    * the same grid.
    */
  def tumbling(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(window(col("ts"), "10 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("sum_value"))
      .select(col("w.start").cast("long").as("win_start"), col("event_type"),
        col("cnt"), col("sum_value"))
      .orderBy("win_start", "event_type")

  /** Sliding windows: 10-minute length, 5-minute slide — each event lands in
    * exactly two windows.
    */
  def sliding(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(window(col("ts"), "10 minutes", "5 minutes").as("w"))
      .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("sum_value"))
      .select(col("w.start").cast("long").as("win_start"), col("cnt"), col("sum_value"))
      .orderBy("win_start")

  /** Sessionization: gaps-and-islands with a 30-minute inactivity timeout
    * per user — lag + cumulative flag sum, the batch analog of
    * session_window (which Structured Streaming runs incrementally).
    */
  def sessionize(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val flagged = Tables.events(s, d)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          col("ts").cast("long") - col("prev_ts").cast("long") > 1800, 1L).otherwise(0L))
      .withColumn("session_seq", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    flagged.groupBy(col("user_id"), col("session_seq"))
      .agg(
        min(col("ts").cast("long")).as("session_start"),
        max(col("ts").cast("long")).as("session_end"),
        count(lit(1)).as("n_events"),
        round(sum("value"), 2).as("sum_value"))
      .orderBy("user_id", "session_seq")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_events_tumbling" -> (tumbling(_, _)),
    "q_events_sliding" -> (sliding(_, _)),
    "q_events_session" -> (sessionize(_, _))
  )

  val oracles: Map[String, String] = Map(
    "q_events_tumbling" ->
      """SELECT CAST(floor(epoch(ts) / 600) * 600 AS BIGINT) AS win_start,
        |       event_type, count(*) AS cnt, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_events_sliding" ->
      """SELECT win_start, count(*) AS cnt, round(sum(value), 2) AS sum_value
        |FROM (
        |  SELECT CAST(floor(epoch(ts) / 300) * 300 AS BIGINT) AS win_start, value FROM events
        |  UNION ALL
        |  SELECT CAST(floor(epoch(ts) / 300) * 300 - 300 AS BIGINT) AS win_start, value FROM events)
        |GROUP BY win_start ORDER BY win_start""".stripMargin,
    "q_events_session" ->
      """WITH flagged AS (
        |  SELECT user_id, event_id, ts, value,
        |         CASE WHEN lag(ts) OVER w IS NULL
        |                OR floor(epoch(ts)) - floor(epoch(lag(ts) OVER w)) > 1800
        |              THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), numbered AS (
        |  SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
        |  FROM flagged)
        |SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
        |       CAST(floor(epoch(min(ts))) AS BIGINT) AS session_start,
        |       CAST(floor(epoch(max(ts))) AS BIGINT) AS session_end,
        |       count(*) AS n_events, round(sum(value), 2) AS sum_value
        |FROM numbered GROUP BY user_id, session_seq
        |ORDER BY user_id, session_seq""".stripMargin
  )
}
