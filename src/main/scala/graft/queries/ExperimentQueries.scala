package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Experimentation + attribution analytics over the events stream, and
  * the null-aware anti-join surface. All epoch math is exact-integer
  * microseconds (the SequenceQueries convention); float statistics are
  * rounded at 6dp after identical-formula arithmetic on both engines.
  */
object ExperimentQueries {

  private def ev(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).select(col("user_id"), col("event_id"),
      col("event_type"), col("value"), unix_micros(col("ts")).as("us"))

  /** Last-touch attribution: each purchase credits the most recent
    * PRECEDING non-purchase event of the same user (IGNORE NULLS last()
    * over an unbounded-to--1 frame); purchases with no prior touch fall
    * to 'direct'. One shuffle on user_id; the revenue rollup is a tiny
    * channel-level aggregate.
    */
  def attribution(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    ev(s, d)
      .withColumn("last_touch",
        last(when(col("event_type") =!= "purchase", col("event_type")), true)
          .over(byUser))
      .filter(col("event_type") === "purchase")
      .groupBy(coalesce(col("last_touch"), lit("direct")).as("channel"))
      .agg(count(lit(1)).as("n_purchases"), round(sum("value"), 2).as("revenue"))
      .orderBy("channel")
  }

  /** A/B experiment readout: deterministic 50/50 assignment (user_id
    * parity — the hash-bucket assignment every experiment platform uses),
    * purchase-value metric, Welch's t statistic from per-variant
    * (n, mean, s²). Two conditional aggregates in ONE pass — no
    * per-variant scans — then scalar arithmetic.
    */
  def abTtest(s: SparkSession, d: String): DataFrame = {
    val purchases = ev(s, d).filter(col("event_type") === "purchase")
      .select((col("user_id") % 2).as("variant"), col("value"))
    val stats = purchases.groupBy("variant")
      .agg(count(lit(1)).as("n"), avg("value").as("mean"),
        var_samp(col("value")).as("v"))
    stats.agg(
      max(when(col("variant") === 0, col("n"))).as("n0"),
      max(when(col("variant") === 1, col("n"))).as("n1"),
      max(when(col("variant") === 0, col("mean"))).as("m0"),
      max(when(col("variant") === 1, col("mean"))).as("m1"),
      max(when(col("variant") === 0, col("v"))).as("v0"),
      max(when(col("variant") === 1, col("v"))).as("v1"))
      .select(col("n0"), col("n1"), round(col("m0"), 6).as("mean0"),
        round(col("m1"), 6).as("mean1"),
        round((col("m0") - col("m1")) /
          sqrt(col("v0") / col("n0") + col("v1") / col("n1")), 6).as("t_stat"))
  }

  /** Autocorrelation of the hourly event-count series at lags 1 and 24
    * (the seasonality diagnostic before any forecast): zero-filled dense
    * hourly grid (missing buckets must be zeros, not absent — same
    * regularization as q_resample_1h), lag() windows, then Pearson corr
    * aggregates. Counts are exact integers; only the final correlations
    * are floats.
    */
  def autocorr(s: SparkSession, d: String): DataFrame = {
    val hrs = ev(s, d).select(expr("us div 3600000000").as("hr"))
      .groupBy("hr").agg(count(lit(1)).as("cnt"))
    val grid = hrs.agg(min("hr").as("lo"), max("hr").as("hi"))
      .select(explode(sequence(col("lo"), col("hi"), lit(1L))).as("hr"))
    val dense = grid.join(hrs, Seq("hr"), "left")
      .select(col("hr"), coalesce(col("cnt"), lit(0L)).as("cnt"))
    val w = Window.orderBy("hr")
    dense
      .withColumn("lag1", lag(col("cnt"), 1).over(w))
      .withColumn("lag24", lag(col("cnt"), 24).over(w))
      .agg(count(lit(1)).as("n_hours"),
        round(corr(col("cnt"), col("lag1")), 6).as("r_lag1"),
        round(corr(col("cnt"), col("lag24")), 6).as("r_lag24"))
  }

  /** Null-aware anti join: `NOT IN` over a NULLABLE expression plans
    * Spark's single-column null-aware anti join (a broadcast variant that
    * must check "did the build side contain any NULL" before rejecting) —
    * ordinary left_anti is WRONG for NOT IN the moment the build side can
    * hold a null, which is exactly the SQL-semantics trap the
    * dedup_incremental ADVICE fix was about. The nullif() keeps the build
    * column nullable without making the result vacuous.
    */
  def nullAwareAnti(s: SparkSession, d: String): DataFrame = {
    Tables.customer(s, d).createOrReplaceTempView("naa_customer")
    Tables.orders(s, d).createOrReplaceTempView("naa_orders")
    s.sql(
      """SELECT c_custkey, c_acctbal
        |FROM naa_customer
        |WHERE c_custkey NOT IN (
        |  SELECT nullif(o_custkey, -1) FROM naa_orders
        |  WHERE o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin)
  }

  /** Trailing-1h rolling regression slope per event type (rolling beta):
    * the five power sums (n, Σx, Σy, Σxy, Σx²) accumulate as exact
    * BIGINTs inside a time-RANGE window — x is epoch seconds rebased to
    * the fixture epoch so x² stays far from 2⁶³, y is cents — and the
    * closed-form slope assembles in doubles from those exact integers
    * (identical formula both engines; degenerate windows emit NULL).
    * RANGE framing makes the result independent of intra-second row
    * order. Scale: one shuffle on event_type + a per-partition
    * time-ordered pass — the streaming-adjacent rolling-statistic shape.
    */
  def rollingSlope(s: SparkSession, d: String): DataFrame = {
    val base = 1704067200L // 2024-01-01, the fixture epoch
    val ev = Tables.events(s, d).select(col("event_id"), col("event_type"),
      (unix_seconds(col("ts")) - base).as("x"),
      round(col("value") * 100).cast("long").as("y"))
    val w = Window.partitionBy("event_type").orderBy("x").rangeBetween(-3600, 0)
    ev
      .withColumn("n_w", count(lit(1)).over(w))
      .withColumn("sx", sum(col("x")).over(w))
      .withColumn("sy", sum(col("y")).over(w))
      .withColumn("sxy", sum(col("x") * col("y")).over(w))
      .withColumn("sxx", sum(col("x") * col("x")).over(w))
      .withColumn("den", col("n_w").cast("double") * col("sxx")
        - col("sx").cast("double") * col("sx"))
      .withColumn("slope", when(col("den") > 0,
        round((col("n_w").cast("double") * col("sxy")
          - col("sx").cast("double") * col("sy")) / col("den"), 6)))
      .select("event_id", "event_type", "x", "y", "n_w", "slope")
      .orderBy("event_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_rolling_slope" -> (rollingSlope(_, _)),
    "q_attribution" -> (attribution(_, _)),
    "q_ab_ttest" -> (abTtest(_, _)),
    "q_autocorr" -> (autocorr(_, _)),
    "q_null_aware_anti" -> (nullAwareAnti(_, _))
  )

  val oracles: Map[String, String] = Map(
    "q_rolling_slope" ->
      """WITH ev AS (
        |  SELECT event_id, event_type,
        |         CAST(floor(epoch(ts)) AS BIGINT) - 1704067200 AS x,
        |         CAST(round(value * 100) AS BIGINT) AS y
        |  FROM events),
        |wnd AS (
        |  SELECT event_id, event_type, x, y,
        |         CAST(count(*) OVER w AS BIGINT) AS n_w,
        |         CAST(sum(x) OVER w AS BIGINT) AS sx,
        |         CAST(sum(y) OVER w AS BIGINT) AS sy,
        |         CAST(sum(x * y) OVER w AS BIGINT) AS sxy,
        |         CAST(sum(x * x) OVER w AS BIGINT) AS sxx
        |  FROM ev
        |  WINDOW w AS (PARTITION BY event_type ORDER BY x
        |               RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW))
        |SELECT event_id, event_type, x, y, n_w,
        |       CASE WHEN CAST(n_w AS DOUBLE) * sxx
        |                 - CAST(sx AS DOUBLE) * sx > 0
        |            THEN round((CAST(n_w AS DOUBLE) * sxy
        |                        - CAST(sx AS DOUBLE) * sy)
        |                       / (CAST(n_w AS DOUBLE) * sxx
        |                          - CAST(sx AS DOUBLE) * sx), 6)
        |       END AS slope
        |FROM wnd ORDER BY event_id""".stripMargin,
    "q_attribution" ->
      """WITH e AS (SELECT user_id, event_id, event_type, value,
        |                 epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        |touched AS (
        |  SELECT event_type, value,
        |         last_value(CASE WHEN event_type <> 'purchase'
        |                         THEN event_type END IGNORE NULLS)
        |           OVER (PARTITION BY user_id ORDER BY us, event_id
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |           AS last_touch
        |  FROM e)
        |SELECT coalesce(last_touch, 'direct') AS channel,
        |       CAST(count(*) AS BIGINT) AS n_purchases,
        |       round(sum(value), 2) AS revenue
        |FROM touched WHERE event_type = 'purchase'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_ab_ttest" ->
      """WITH p AS (
        |  SELECT user_id % 2 AS variant, value FROM events
        |  WHERE event_type = 'purchase'),
        |s AS (SELECT variant, count(*) AS n, avg(value) AS mean,
        |             var_samp(value) AS v
        |      FROM p GROUP BY variant),
        |w AS (SELECT
        |        max(CASE WHEN variant = 0 THEN n END) AS n0,
        |        max(CASE WHEN variant = 1 THEN n END) AS n1,
        |        max(CASE WHEN variant = 0 THEN mean END) AS m0,
        |        max(CASE WHEN variant = 1 THEN mean END) AS m1,
        |        max(CASE WHEN variant = 0 THEN v END) AS v0,
        |        max(CASE WHEN variant = 1 THEN v END) AS v1
        |      FROM s)
        |SELECT CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1,
        |       round(m0, 6) AS mean0, round(m1, 6) AS mean1,
        |       round((m0 - m1) / sqrt(v0 / n0 + v1 / n1), 6) AS t_stat
        |FROM w""".stripMargin,
    "q_autocorr" ->
      """WITH hrs AS (
        |  SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS hr,
        |         count(*) AS cnt
        |  FROM events GROUP BY 1),
        |b AS (SELECT min(hr) AS lo, max(hr) AS hi FROM hrs),
        |grid AS (SELECT unnest(range((SELECT lo FROM b),
        |                             (SELECT hi FROM b) + 1)) AS hr),
        |dense AS (
        |  SELECT grid.hr, coalesce(cnt, 0) AS cnt
        |  FROM grid LEFT JOIN hrs USING (hr)),
        |lagged AS (
        |  SELECT cnt, lag(cnt, 1) OVER (ORDER BY hr) AS lag1,
        |              lag(cnt, 24) OVER (ORDER BY hr) AS lag24
        |  FROM dense)
        |SELECT CAST(count(*) AS BIGINT) AS n_hours,
        |       round(corr(cnt, lag1), 6) AS r_lag1,
        |       round(corr(cnt, lag24), 6) AS r_lag24
        |FROM lagged""".stripMargin,
    "q_null_aware_anti" ->
      """SELECT c_custkey, c_acctbal
        |FROM customer
        |WHERE c_custkey NOT IN (
        |  SELECT nullif(o_custkey, -1) FROM orders
        |  WHERE o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin
  )
}
