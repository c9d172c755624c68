package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The remaining classic TPC-H plan shapes over the driver star schema —
  * the canonical OLAP workloads a general engine must run well (the
  * reference's single-input MapReduce apps cannot express any of these;
  * /root/reference/src/app/ has no join or multi-agg operator).
  *
  * Q4/Q12 are ADAPTED: the driver's lineitem has no
  * l_commitdate/l_receiptdate/l_shipmode, so the late-delivery predicate
  * becomes l_shipdate > o_orderdate + 60 days and Q12's shipmode dimension
  * becomes l_linestatus — same plan shapes (semi-join + agg; join +
  * conditional aggregation), different column names.
  *
  * Scale notes: Q1 is a single scan + hash agg with map-side partials (6
  * groups — partial agg collapses everything before the shuffle). Q4 is a
  * left-semi broadcast-free join on orderkey where AQE picks the strategy.
  * Q10/Q18 shuffle lineitem once on orderkey; dims are broadcast. Q14 is a
  * part⋈lineitem join where part is broadcast, so the fact table never
  * shuffles. Float aggregates are rounded in both engines (order-dependent
  * low bits).
  */
object TpchQueries {

  import org.apache.spark.sql.Column

  /** Silent-wrap guard for BIGINT fixed-point money totals (r8 ADVICE).
    * With ANSI off, `sum(long)` wraps silently past 2^63. Every per-row
    * cents/e4 addend here is non-negative, so the FIRST wrap necessarily
    * lands the total negative (or, before wrapping, crosses 2^62 — kept
    * as the alarm margin so the guard fires a full 2× before the wrap).
    * `assert_true` is NULL on pass, so `coalesce` forwards the total
    * untouched; on a breach the job fails loudly instead of publishing a
    * wrapped figure. Per-GROUP cost: one compare on the 6 output rows. */
  private[graft] def wrapGuard(c: Column): Column =
    coalesce(
      assert_true(c.isNull || (c >= 0L && c < (1L << 62)),
        concat(lit("int64 fixed-point money total wrapped/over margin: "),
          c.cast("string"))).cast("long"),
      c)

  /** Q1 — pricing summary report: the canonical wide hash-aggregate.
    * Money totals are exact integer sums (BIGINT cents / e4 micro-units,
    * the q_tpch_q9 fixed-point discipline): the r8 sf10 sweep caught all
    * three round(sum(double),2) totals flipping the last cent on ~10M-row
    * strata — order-dependent under any partitioning. Each row's value is
    * rounded on the SAME IEEE expression tree in both engines, then summed
    * exactly. Headroom (r8 ADVICE correction): the largest stratum's
    * sum_charge_e4 is ~1.2e18 at sf1000 — ~8× below int64, measured 180×
    * at sf100 — NOT the ~100×-at-sf1000 an earlier comment claimed; with
    * ANSI off a further decade would wrap SILENTLY, so each e4/cents total
    * passes `wrapGuard` (positive addends: a first wrap lands negative or
    * past 2^62 — fail loudly, don't publish a wrapped total).
    * Averages stay double (error 6 orders below the 4-dp rounding grid). */
  def q1(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("2001-09-01"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        wrapGuard(sum(round(col("l_extendedprice") * 100).cast("long")))
          .as("sum_base_c"),
        wrapGuard(sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 10000)
          .cast("long"))).as("sum_disc_e4"),
        wrapGuard(sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) *
          (lit(1) + col("l_tax")) * 10000).cast("long"))).as("sum_charge_e4"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_extendedprice")), 4).as("avg_price"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** Q4 (adapted) — order priority checking: how many orders per priority
    * had at least one line shipped > 60 days after the order date. EXISTS ≡
    * left-semi join; the count is per-order, not per-matching-line.
    */
  def q4(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1996-01-01") &&
        col("o_orderdate") < lit("1997-01-01"))
    val li = Tables.lineitem(s, d)
    o.join(li,
        o("o_orderkey") === li("l_orderkey") &&
          li("l_shipdate") > o("o_orderdate") + expr("INTERVAL 60 DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  /** Q10 — returned-item reporting: top 20 customers by revenue lost to
    * returns. One lineitem shuffle on orderkey; customer/nation broadcast.
    */
  def q10(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val n = Tables.nation(s, d)
    val o = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1996-01-01") &&
        col("o_orderdate") < lit("1996-07-01"))
    val li = Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(c("c_custkey").as("c_custkey"), c("c_name").as("c_name"),
        n("n_name").as("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  /** Q12 (adapted) — late-line status classification: for lines shipped in
    * one year, count urgent vs non-urgent orders per linestatus. The
    * conditional-aggregation-over-join shape of TPC-H Q12.
    */
  def q12(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val li = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-01-01") &&
        col("l_shipdate") < lit("1998-01-01"))
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy(col("l_linestatus"))
      .agg(
        sum(when(col("o_orderpriority") === "1-URGENT" ||
          col("o_orderpriority") === "2-HIGH", 1L).otherwise(0L))
          .as("high_line_count"),
        sum(when(col("o_orderpriority") =!= "1-URGENT" &&
          col("o_orderpriority") =!= "2-HIGH", 1L).otherwise(0L))
          .as("low_line_count"))
      .orderBy("l_linestatus")
  }

  /** Q14 (adapted) — promotion-class revenue share: percentage of one
    * month's revenue from ECONOMY-type parts. Part is broadcast — the fact
    * scan never shuffles; the ratio is a single conditional aggregate.
    */
  def q14(s: SparkSession, d: String): DataFrame = {
    val p = Tables.part(s, d)
    val li = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-03-01") &&
        col("l_shipdate") < lit("1997-04-01"))
    li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
      .agg(round(
        lit(100.0) *
          sum(when(p("p_type") === "ECONOMY",
            col("l_extendedprice") * (lit(1) - col("l_discount")))
            .otherwise(lit(0.0))) /
          sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
        .as("promo_revenue_pct"))
  }

  /** Q18 — large-volume customers: orders whose total quantity exceeds 300,
    * with customer attribution. The agg→having→join-back shape: lineitem
    * aggregates FIRST (one shuffle on its natural key), and only the tiny
    * qualifying set joins customers/orders.
    */
  def q18(s: SparkSession, d: String): DataFrame = {
    val big = Tables.lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(round(sum(col("l_quantity")), 2).as("total_qty"))
      .filter(col("total_qty") > 300.0)
    val o = Tables.orders(s, d)
    val c = Tables.customer(s, d)
    big.join(o, big("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .select(c("c_custkey").as("c_custkey"), c("c_name").as("c_name"),
        o("o_orderkey").as("o_orderkey"), o("o_totalprice").as("o_totalprice"),
        col("total_qty"))
      .orderBy(col("total_qty").desc, col("o_orderkey"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_tpch_q1" -> (q1(_, _)),
    "q_tpch_q4" -> (q4(_, _)),
    "q_tpch_q10" -> (q10(_, _)),
    "q_tpch_q12" -> (q12(_, _)),
    "q_tpch_q14" -> (q14(_, _)),
    "q_tpch_q18" -> (q18(_, _))
  )

  val oracles: Map[String, String] = Map(
    "q_tpch_q1" ->
      """SELECT l_returnflag, l_linestatus,
        |       round(sum(l_quantity), 2) AS sum_qty,
        |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
        |         AS sum_base_c,
        |       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
        |                     AS BIGINT)) AS BIGINT) AS sum_disc_e4,
        |       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 10000)
        |                     AS BIGINT)) AS BIGINT) AS sum_charge_e4,
        |       round(avg(l_quantity), 4) AS avg_qty,
        |       round(avg(l_extendedprice), 4) AS avg_price,
        |       round(avg(l_discount), 4) AS avg_disc,
        |       count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2001-09-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_tpch_q4" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders o
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q_tpch_q10" ->
      """SELECT c_custkey, c_name, n_name,
        |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-07-01'
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue DESC, c_custkey
        |LIMIT 20""".stripMargin,
    "q_tpch_q12" ->
      """SELECT l_linestatus,
        |       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
        |                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |GROUP BY l_linestatus
        |ORDER BY l_linestatus""".stripMargin,
    "q_tpch_q14" ->
      """SELECT round(100.0 *
        |         sum(CASE WHEN p_type = 'ECONOMY'
        |                  THEN l_extendedprice * (1 - l_discount)
        |                  ELSE 0.0 END) /
        |         sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue_pct
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1997-03-01'
        |  AND l_shipdate < TIMESTAMP '1997-04-01'""".stripMargin,
    "q_tpch_q18" ->
      """WITH big AS (
        |  SELECT l_orderkey, round(sum(l_quantity), 2) AS total_qty
        |  FROM lineitem GROUP BY l_orderkey
        |  HAVING round(sum(l_quantity), 2) > 300.0)
        |SELECT c_custkey, c_name, o_orderkey, o_totalprice, total_qty
        |FROM big
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY total_qty DESC, o_orderkey""".stripMargin
  )
}
