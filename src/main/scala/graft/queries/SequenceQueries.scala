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

  /** Sequential-pattern mining, 2-sequences (the GSP/PrefixSpan support
    * primitive): pattern a→b is supported by a user iff SOME a-event
    * strictly precedes SOME b-event — existential, counted once per user,
    * which distinguishes it from `q_markov_transitions` (adjacent
    * transitions, multiplicity-counted) and `q_market_basket` (unordered
    * co-occurrence). The existential test collapses to one aggregate per
    * (user, type): first-occurrence < last-occurrence of the partner, so
    * the per-user join is over the TYPE UNIVERSE (≤ |types|² rows/user,
    * here 25), never event×event. Confidence = P(b after a | user has a).
    * Ties on the microsecond stamp do not count as "before" (strict,
    * exact-integer comparison on both engines).
    */
  def seqPairs(s: SparkSession, d: String): DataFrame = {
    val occ = ev(s, d)
      .groupBy(col("user_id"), col("event_type"))
      .agg(min(col("us")).as("first_us"), max(col("us")).as("last_us"))
      .localCheckpoint(false) // feeds both sides of the per-user pair join
    val ab = occ.as("a").join(occ.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.first_us") < col("b.last_us"))
      .groupBy(col("a.event_type").as("ante"), col("b.event_type").as("cons"))
      .agg(count(lit(1)).as("n_users_ab"))
    val na = occ.groupBy(col("event_type").as("ante"))
      .agg(count(lit(1)).as("n_users_ante"))
    ab.join(broadcast(na), "ante")
      .select(col("ante"), col("cons"), col("n_users_ab"), col("n_users_ante"),
        round(col("n_users_ab") / col("n_users_ante"), 6).as("conf"))
      .orderBy("ante", "cons")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_markov_transitions" -> (markovTransitions(_, _)),
    "mining_seq_pairs" -> (seqPairs(_, _))
  )

  val oracles: Map[String, String] = Map(
    "mining_seq_pairs" ->
      """WITH e AS (SELECT user_id, event_type,
        |                 epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        |occ AS (
        |  SELECT user_id, event_type,
        |         min(us) AS first_us, max(us) AS last_us
        |  FROM e GROUP BY 1, 2),
        |ab AS (
        |  SELECT a.event_type AS ante, b.event_type AS cons,
        |         CAST(count(*) AS BIGINT) AS n_users_ab
        |  FROM occ a JOIN occ b
        |    ON a.user_id = b.user_id AND a.first_us < b.last_us
        |  GROUP BY 1, 2),
        |na AS (
        |  SELECT event_type AS ante, CAST(count(*) AS BIGINT) AS n_users_ante
        |  FROM occ GROUP BY 1)
        |SELECT ab.ante, ab.cons, ab.n_users_ab, na.n_users_ante,
        |       round(ab.n_users_ab / CAST(na.n_users_ante AS DOUBLE), 6) AS conf
        |FROM ab JOIN na ON ab.ante = na.ante
        |ORDER BY ab.ante, ab.cons""".stripMargin,
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
