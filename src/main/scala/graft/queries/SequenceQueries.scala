package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-sequence analytics over the events stream (funnel and cohort
  * retention live in AnalyticsQueries): the first-order Markov transition
  * matrix — a single-shuffle shape (hash on user_id, lead() inside the
  * partition, then a tiny type×type aggregate), so it scales linearly
  * with event volume; no event-×-event join.
  *
  * Timestamps compare as epoch MICROSECONDS (exact integers on both
  * engines — `unix_micros` here, `epoch_us` in DuckDB) so the per-user
  * total order can never drift on sub-second ties.
  */
object SequenceQueries {

  private def ev(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).select(col("user_id"), col("event_id"),
      col("event_type"), unix_micros(col("ts")).as("us"))

  /** First-order Markov transition matrix over event types: per-user
    * next-event via lead() on the (µs, event_id) total order, then counts
    * and row-normalized probabilities. The LM-style sequence statistic
    * (cf. text_trigram_lm) on the behavioral stream.
    */
  def markovTransitions(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    val pairs = ev(s, d)
      .withColumn("next_type", lead(col("event_type"), 1).over(byUser))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
      .agg(count(lit(1)).as("cnt"))
    val fromTotals = Window.partitionBy("from_type")
    pairs
      .withColumn("p", round(col("cnt") / sum("cnt").over(fromTotals), 6))
      .select("from_type", "to_type", "cnt", "p")
      .orderBy("from_type", "to_type")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_markov_transitions" -> (markovTransitions(_, _))
  )

  val oracles: Map[String, String] = Map(
    "q_markov_transitions" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
        |                 epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        |nxt AS (
        |  SELECT event_type AS from_type,
        |         lead(event_type) OVER (PARTITION BY user_id
        |                                ORDER BY us, event_id) AS to_type
        |  FROM e),
        |cnts AS (
        |  SELECT from_type, to_type, count(*) AS cnt FROM nxt
        |  WHERE to_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, CAST(cnt AS BIGINT) AS cnt,
        |       round(cnt / (sum(cnt) OVER (PARTITION BY from_type)), 6) AS p
        |FROM cnts ORDER BY from_type, to_type""".stripMargin
  )
}
