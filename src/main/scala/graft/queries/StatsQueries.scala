package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Regression aggregates, edit-distance similarity, and time-range rolling
  * windows — the statistical tail of the operator surface.
  */
object StatsQueries {

  /** Linear-regression aggregates (slope/intercept/r²/count). */
  def regression(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        round(regr_slope(col("l_extendedprice"), col("l_quantity")), 4).as("slope"),
        round(regr_intercept(col("l_extendedprice"), col("l_quantity")), 4).as("icept"),
        round(regr_r2(col("l_extendedprice"), col("l_quantity")), 6).as("r2"),
        regr_count(col("l_extendedprice"), col("l_quantity")).as("n"))
      .orderBy("l_returnflag")

  /** Edit distance — the fuzzy-match primitive for near-dup record linkage
    * (complementing the token/shingle/embedding dedup family): distance of
    * each part name to a probe string, nearest first.
    */
  def editDistance(s: SparkSession, d: String, probe: String = "almond antique blue"): DataFrame =
    Tables.part(s, d)
      .select(col("p_partkey"), col("p_name"),
        levenshtein(col("p_name"), lit(probe)).cast("long").as("dist"))
      .orderBy("dist", "p_partkey")
      .limit(25)

  /** Time-range rolling window: events in the trailing hour per row —
    * RANGE frame over epoch seconds (value-based, not row-count-based).
    */
  def rollingHour(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("sec")).rangeBetween(-3600L, 0L)
    Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("ts").cast("long").as("sec"),
        col("value"))
      .withColumn("n_trailing_1h", count(lit(1)).over(w))
      .withColumn("sum_trailing_1h", round(sum(col("value")).over(w), 2))
      .select("event_id", "user_id", "n_trailing_1h", "sum_trailing_1h")
      .orderBy("event_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_regression" -> (regression(_, _)),
    "q_edit_distance" -> (editDistance(_, _)),
    "q_rolling_1h" -> (rollingHour(_, _))
  )

  val oracles: Map[String, String] = Map(
    "q_regression" ->
      """SELECT l_returnflag,
        |       round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
        |       round(regr_intercept(l_extendedprice, l_quantity), 4) AS icept,
        |       round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
        |       regr_count(l_extendedprice, l_quantity) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_edit_distance" ->
      """SELECT p_partkey, p_name,
        |       CAST(levenshtein(p_name, 'almond antique blue') AS BIGINT) AS dist
        |FROM part ORDER BY dist, p_partkey LIMIT 25""".stripMargin,
    "q_rolling_1h" ->
      """SELECT event_id, user_id,
        |       count(*) OVER w AS n_trailing_1h,
        |       round(sum(value) OVER w, 2) AS sum_trailing_1h
        |FROM (SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec, value
        |      FROM events)
        |WINDOW w AS (PARTITION BY user_id ORDER BY sec
        |             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin
  )
}
