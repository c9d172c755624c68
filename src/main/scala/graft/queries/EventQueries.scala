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

  /** Gap-filled hourly resample: the dense (event_type × hour) grid from
    * the observed time range, left-joined to actual hourly aggregates with
    * zero-fill — the regularization step before any time-series model
    * (missing buckets must exist as zeros, not be absent). The grid
    * generates from a 1-row bounds aggregate via sequence() — dimension
    * cross join is |types| × |hours|, never event-sized.
    */
  def resampleHourly(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("event_type"),
        (floor(col("ts").cast("long") / 3600) * 3600).cast("long").as("hr"),
        col("value"))
    val grid = ev.agg(min("hr").as("lo"), max("hr").as("hi"))
      .select(explode(sequence(col("lo"), col("hi"), lit(3600L))).as("hr"))
      .crossJoin(ev.select("event_type").distinct())
    val actual = ev.groupBy("event_type", "hr")
      .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("sum_value"))
    grid.join(actual, Seq("event_type", "hr"), "left")
      .select(col("event_type"), col("hr"),
        coalesce(col("cnt"), lit(0L)).as("cnt"),
        coalesce(col("sum_value"), lit(0.0)).as("sum_value"))
      .orderBy("event_type", "hr")
  }

  /** Hour-of-day seasonal decomposition: per-hour exact cent sums →
    * hour-of-day mean vs the global mean, the seasonal index a
    * forecasting pipeline subtracts before modeling trend. Cent-scaled
    * BIGINT sums keep the means integer-exact; the totals ride on a
    * 24-row unpartitioned window (aggregate-then-window, never a
    * corpus-wide window — the pipeline_token_budget pattern).
    */
  def seasonalHourly(s: SparkSession, d: String): DataFrame = {
    val allW = org.apache.spark.sql.expressions.Window.partitionBy()
    Tables.events(s, d)
      .select(hour(col("ts")).as("hr"),
        round(col("value") * 100).cast("long").as("v_c"))
      .groupBy("hr").agg(count(lit(1)).as("n"), sum(col("v_c")).as("sum_c"))
      .withColumn("tn", sum(col("n")).over(allW))
      .withColumn("tsum", sum(col("sum_c")).over(allW))
      .withColumn("hour_mean", round(col("sum_c") / col("n") / lit(100.0), 6))
      .withColumn("global_mean", round(col("tsum") / col("tn") / lit(100.0), 6))
      .withColumn("seasonal_idx",
        round(col("sum_c") / col("n") / lit(100.0)
          - col("tsum") / col("tn") / lit(100.0), 6))
      .select("hr", "n", "sum_c", "hour_mean", "global_mean", "seasonal_idx")
      .orderBy("hr")
  }

  /** Time-weighted average (TWAP) per event type: each observation holds
    * until the next one, so the mean weights every value by its exact µs
    * holding duration (the IoT/market-data staple a row-count average
    * silently gets wrong on irregular sampling). Σ(v·Δt) and Σ(Δt)
    * accumulate as exact µs·cents; one lead() pass on the (µs,
    * event_id) total order per type, one aggregate. Overflow is LOUD,
    * not silent: Σ(v·Δt) accumulates internally in DECIMAL(38,0) (never
    * an output column — wide decimals are int128-backed, the r5
    * driver-hash frontier) and the final BIGINT cast raise_errors if the
    * total left int64 range, mirroring DuckDB's checked int64 multiply
    * on the oracle side. A fixture large enough to trip it rescales Δt
    * to ms on both sides rather than shipping a wrapped TWAP.
    */
  def timeWeightedAvg(s: SparkSession, d: String): DataFrame = {
    val byType = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy(col("us"), col("event_id"))
    Tables.events(s, d)
      .select(col("event_type"), col("event_id"), unix_micros(col("ts")).as("us"),
        round(col("value") * 100).cast("long").as("v_c"))
      .withColumn("dt_us", lead(col("us"), 1).over(byType) - col("us"))
      .filter(col("dt_us").isNotNull)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_segments"),
        sum(col("dt_us")).as("sum_dt_us"),
        sum(col("v_c").cast("decimal(38,0)") * col("dt_us")).as("sum_vdt_dec"))
      .withColumn("sum_vdt",
        when(col("sum_vdt_dec").between(Long.MinValue, Long.MaxValue),
          col("sum_vdt_dec"))
          .otherwise(raise_error(
            lit("q_twap: sum_vdt overflows BIGINT — rescale dt to ms")))
          .cast("long"))
      .withColumn("twap", round(col("sum_vdt") / col("sum_dt_us") / lit(100.0), 6))
      .select("event_type", "n_segments", "sum_dt_us", "sum_vdt", "twap")
      .orderBy("event_type")
  }

  /** Pivot with MULTIPLE aggregates (q_pivot_events covers the
    * single-agg form): per user-cohort, each event type fans out to a
    * count column AND an exact cent-sum column — the `<value>_<agg>`
    * column-name contract the pivot surface defines. Explicit pivot
    * values keep the output schema static (no extra distinct-values
    * job, the production form).
    */
  def pivotMultiAgg(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select((col("user_id") % 10).as("cohort"), col("event_type"),
        round(col("value") * 100).cast("long").as("v_c"))
      .groupBy("cohort")
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)).as("n"), sum(col("v_c")).as("s"))
      .orderBy("cohort")

  /** Day-over-day growth per event type: daily exact cent totals, the
    * previous day's total via lag() on the (type, day) grid, and the
    * relative change — the KPI trend table. Division of exact integers,
    * NULL on the first day and on a zero base. Aggregate first, window
    * over the tiny (type × day) grid after — never a row-level window.
    */
  def dailyGrowth(s: SparkSession, d: String): DataFrame = {
    val byType = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy("day")
    Tables.events(s, d)
      .select(col("event_type"), to_date(col("ts")).as("day"),
        round(col("value") * 100).cast("long").as("v_c"))
      .groupBy("event_type", "day")
      .agg(count(lit(1)).as("n"), sum(col("v_c")).as("total_c"))
      .withColumn("prev_c", lag(col("total_c"), 1).over(byType))
      .withColumn("delta_c", col("total_c") - col("prev_c"))
      .withColumn("pct_change",
        when(col("prev_c").isNotNull && col("prev_c") =!= 0,
          round((col("total_c") - col("prev_c")) / col("prev_c"), 6)))
      .orderBy("event_type", "day")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_daily_growth" -> (dailyGrowth(_, _)),
    "q_pivot_multi" -> (pivotMultiAgg(_, _)),
    "q_twap" -> (timeWeightedAvg(_, _)),
    "q_seasonal_hourly" -> (seasonalHourly(_, _)),
    "q_events_tumbling" -> (tumbling(_, _)),
    "q_events_sliding" -> (sliding(_, _)),
    "q_events_session" -> (sessionize(_, _)),
    "q_resample_1h" -> (resampleHourly(_, _))
  )

  val oracles: Map[String, String] = Map(
    "q_daily_growth" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |         CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
        |           AS total_c
        |  FROM events GROUP BY 1, 2),
        |g AS (
        |  SELECT *, lag(total_c) OVER (PARTITION BY event_type
        |                               ORDER BY day) AS prev_c
        |  FROM daily)
        |SELECT event_type, day, n, total_c, prev_c,
        |       total_c - prev_c AS delta_c,
        |       CASE WHEN prev_c IS NOT NULL AND prev_c <> 0
        |            THEN round((total_c - prev_c) / prev_c, 6) END AS pct_change
        |FROM g ORDER BY event_type, day""".stripMargin,
    "q_pivot_multi" -> {
      val cells = Seq("click", "error", "purchase", "signup", "view").map { t =>
        s"""CAST(sum(CASE WHEN event_type = '$t' THEN 1 ELSE 0 END) AS BIGINT)
           |  AS ${t}_n,
           |CAST(sum(CASE WHEN event_type = '$t'
           |         THEN CAST(round(value * 100) AS BIGINT) END) AS BIGINT)
           |  AS ${t}_s""".stripMargin
      }.mkString(",\n")
      s"""SELECT user_id % 10 AS cohort,
         |$cells
         |FROM events GROUP BY 1 ORDER BY 1""".stripMargin
    },
    "q_twap" ->
      """WITH e AS (
        |  SELECT event_type, event_id,
        |         epoch_us(CAST(ts AS TIMESTAMP)) AS us,
        |         CAST(round(value * 100) AS BIGINT) AS v_c
        |  FROM events),
        |seg AS (
        |  SELECT event_type, v_c,
        |         lead(us) OVER (PARTITION BY event_type
        |                        ORDER BY us, event_id) - us AS dt_us
        |  FROM e)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_segments,
        |       CAST(sum(dt_us) AS BIGINT) AS sum_dt_us,
        |       CAST(sum(v_c * dt_us) AS BIGINT) AS sum_vdt,
        |       round(sum(v_c * dt_us) / sum(dt_us) / 100.0, 6) AS twap
        |FROM seg WHERE dt_us IS NOT NULL
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_seasonal_hourly" ->
      """WITH ev AS (SELECT CAST(hour(CAST(ts AS TIMESTAMP)) AS INT) AS hr,
        |                   CAST(round(value * 100) AS BIGINT) AS v_c
        |            FROM events),
        |h AS (SELECT hr, CAST(count(*) AS BIGINT) AS n,
        |             CAST(sum(v_c) AS BIGINT) AS sum_c FROM ev GROUP BY hr),
        |t AS (SELECT hr, n, sum_c,
        |             CAST(sum(n) OVER () AS BIGINT) AS tn,
        |             CAST(sum(sum_c) OVER () AS BIGINT) AS tsum FROM h)
        |SELECT hr, n, sum_c,
        |       round(sum_c / n / 100.0, 6) AS hour_mean,
        |       round(tsum / tn / 100.0, 6) AS global_mean,
        |       round(sum_c / n / 100.0 - tsum / tn / 100.0, 6) AS seasonal_idx
        |FROM t ORDER BY hr""".stripMargin,
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
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id)
        |), numbered AS (
        |  SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
        |  FROM flagged)
        |SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
        |       CAST(floor(epoch(min(ts))) AS BIGINT) AS session_start,
        |       CAST(floor(epoch(max(ts))) AS BIGINT) AS session_end,
        |       count(*) AS n_events, round(sum(value), 2) AS sum_value
        |FROM numbered GROUP BY user_id, session_seq
        |ORDER BY user_id, session_seq""".stripMargin,
    "q_resample_1h" ->
      """WITH ev AS (
        |  SELECT event_type,
        |         CAST(floor(floor(epoch(ts)) / 3600) * 3600 AS BIGINT) AS hr,
        |         value
        |  FROM events),
        |b AS (SELECT min(hr) AS lo, max(hr) AS hi FROM ev),
        |grid AS (
        |  SELECT t.event_type, g.hr
        |  FROM (SELECT DISTINCT event_type FROM ev) t,
        |       (SELECT unnest(range((SELECT lo FROM b),
        |                            (SELECT hi FROM b) + 3600, 3600)) AS hr) g),
        |act AS (
        |  SELECT event_type, hr, count(*) AS cnt,
        |         round(sum(value), 2) AS sum_value
        |  FROM ev GROUP BY event_type, hr)
        |SELECT grid.event_type, grid.hr,
        |       coalesce(cnt, 0) AS cnt, coalesce(sum_value, 0.0) AS sum_value
        |FROM grid LEFT JOIN act USING (event_type, hr)
        |ORDER BY event_type, hr""".stripMargin
  )
}
