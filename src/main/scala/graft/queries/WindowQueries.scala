package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window functions, top-k and per-group top-k — absent in the reference
  * (SURVEY.md §2.C window row); the grep app's per-file line numbering
  * (/root/reference/src/app/grep.rs:41-45) is the one place the reference
  * hand-rolls what `row_number()` does natively.
  *
  * Scale notes: a window partitioned by a key shuffles once on that key —
  * same cost shape as a groupBy. Global top-k compiles to
  * TakeOrderedAndProject (per-partition heap + driver merge of k rows), never
  * a full global sort.
  */
object WindowQueries {

  /** Ranking trio over customers per market segment. Window ordering carries
    * a unique tie-break (custkey) so row_number is deterministic; rank/
    * dense_rank are computed on acctbal alone (ties allowed — values, not
    * positions, are compared).
    */
  def windowRank(s: SparkSession, d: String): DataFrame = {
    val byBal = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    val byBalOnly = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal").desc)
    Tables.customer(s, d)
      .select(col("c_mktsegment"), col("c_custkey"), round(col("c_acctbal"), 2).as("acctbal"),
        row_number().over(byBal).as("rn"),
        rank().over(byBalOnly).as("rnk"),
        dense_rank().over(byBalOnly).as("drnk"))
      .filter(col("rn") <= 20)
      .orderBy("c_mktsegment", "c_custkey")
  }

  /** lag/lead: order-over-order price delta per customer. */
  def windowLag(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"),
        round(col("o_totalprice"), 2).as("price"),
        round(lag(col("o_totalprice"), 1).over(w), 2).as("prev_price"),
        round(lead(col("o_totalprice"), 1).over(w), 2).as("next_price"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Frames: running total + 3-row moving average per supplier shipment. */
  def windowFrame(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
    Tables.lineitem(s, d)
      .filter(col("l_suppkey") <= 5)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        round(sum(col("l_quantity")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2).as("running_qty"),
        round(avg(col("l_quantity")).over(
          w.rowsBetween(-2, Window.currentRow)), 4).as("mavg_qty"))
      .orderBy("l_suppkey", "l_orderkey", "l_linenumber")
  }

  /** Global top-k → TakeOrderedAndProject (no full sort at scale). */
  def topkGlobal(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("price"))
      .orderBy(col("price").desc, col("o_orderkey"))
      .limit(15)

  /** Per-group top-k via ranked window + filter. */
  def topkPerGroup(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("p_brand"))
      .orderBy(col("p_retailprice").desc, col("p_partkey"))
    Tables.part(s, d)
      .select(col("p_brand"), col("p_partkey"),
        round(col("p_retailprice"), 2).as("price"),
        row_number().over(w).as("rn"))
      .filter(col("rn") <= 3)
      .orderBy("p_brand", "rn")
  }

  /** Time-RANGE frame: rolling trailing-1-hour count/sum per user, the
    * value-based frame (RANGE BETWEEN n PRECEDING) as opposed to the
    * row-counted frames above — the sliding-lookback every ops dashboard
    * and rate-limiter computes. Bounds ride on exact epoch-µs integers so
    * the frame edge can never drift across engines; rows tied on the
    * ORDER BY value share one frame (RANGE semantics) identically in
    * both.
    */
  def windowTimeRange(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("us"))
      .rangeBetween(-3600000000L, 0L)
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"), col("value"))
      .withColumn("n_1h", count(lit(1)).over(w))
      .withColumn("sum_1h", round(sum("value").over(w), 2))
      .select("user_id", "event_id", "us", "n_1h", "sum_1h")
      .orderBy("user_id", "us", "event_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_window_rank" -> (windowRank(_, _)),
    "q_window_lag" -> (windowLag(_, _)),
    "q_window_frame" -> (windowFrame(_, _)),
    "q_window_timerange" -> (windowTimeRange(_, _)),
    "q_topk_global" -> (topkGlobal(_, _)),
    "q_topk_pergroup" -> (topkPerGroup(_, _)),
    "q_topk_native" -> (topkNative(_, _))
  )

  /** Per-group top-k through the native bounded-heap aggregate
    * (`plans/TopKAgg`, a TypedImperativeAggregate) instead of the rank
    * window `topkPerGroup` uses. Both plans bound the exchange to ≤ k
    * rows per group per task (Spark's WindowGroupLimit gives the window
    * that much), but the window plan still sorts every map partition to
    * feed the group-limit; the aggregate keeps a 5-element heap per
    * group per task — no map-side sort at all, O(n log k) not
    * O(n log n). The payload long doubles as the deterministic tie-break
    * ((price DESC, ref ASC) total order, refs unique by construction),
    * so both engines emit one exact answer. posexplode flattens the
    * array<struct> to scalar rows for the gate.
    */
  def topkNative(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select(col("l_returnflag").as("flag"),
        round(col("l_extendedprice") * 100).cast("long").as("price_c"),
        (col("l_orderkey") * 8L + col("l_linenumber")).as("ref"))
      .groupBy("flag")
      .agg(graft.plans.TopKAgg.topk(col("price_c"), col("ref"), 5).as("top"))
      .select(col("flag"), posexplode(col("top")))
      .select(col("flag"), (col("pos") + 1).cast("int").as("rnk"),
        col("col.k").as("price_c"), col("col.p").as("ref"))
      .orderBy("flag", "rnk")

  val oracles: Map[String, String] = Map(
    "q_window_timerange" ->
      """WITH e AS (SELECT user_id, event_id, value,
        |                 epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events)
        |SELECT user_id, event_id, us,
        |       CAST(count(*) OVER w AS BIGINT) AS n_1h,
        |       round(sum(value) OVER w, 2) AS sum_1h
        |FROM e
        |WINDOW w AS (PARTITION BY user_id ORDER BY us
        |             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, us, event_id""".stripMargin,
    "q_topk_native" ->
      """SELECT flag, CAST(rn AS INT) AS rnk, price_c, ref FROM (
        |  SELECT l_returnflag AS flag,
        |         CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c,
        |         l_orderkey * 8 + l_linenumber AS ref,
        |         row_number() OVER (PARTITION BY l_returnflag
        |           ORDER BY CAST(round(l_extendedprice * 100) AS BIGINT) DESC,
        |                    l_orderkey * 8 + l_linenumber) AS rn
        |  FROM lineitem)
        |WHERE rn <= 5 ORDER BY flag, rnk""".stripMargin,
    "q_window_rank" ->
      """SELECT * FROM (
        |  SELECT c_mktsegment, c_custkey, round(c_acctbal, 2) AS acctbal,
        |         CAST(row_number() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS INT) AS rn,
        |         CAST(rank() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC) AS INT) AS rnk,
        |         CAST(dense_rank() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC) AS INT) AS drnk
        |  FROM customer)
        |WHERE rn <= 20 ORDER BY c_mktsegment, c_custkey""".stripMargin,
    "q_window_lag" ->
      """SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS price,
        |       round(lag(o_totalprice, 1) OVER w, 2) AS prev_price,
        |       round(lead(o_totalprice, 1) OVER w, 2) AS next_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_window_frame" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |       round(sum(l_quantity) OVER (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_qty,
        |       round(avg(l_quantity) OVER (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
        |             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS mavg_qty
        |FROM lineitem WHERE l_suppkey <= 5
        |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin,
    "q_topk_global" ->
      """SELECT o_orderkey, round(o_totalprice, 2) AS price
        |FROM orders ORDER BY price DESC, o_orderkey LIMIT 15""".stripMargin,
    "q_topk_pergroup" ->
      """SELECT * FROM (
        |  SELECT p_brand, p_partkey, round(p_retailprice, 2) AS price,
        |         CAST(row_number() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS INT) AS rn
        |  FROM part)
        |WHERE rn <= 3 ORDER BY p_brand, rn""".stripMargin
  )
}
