package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Join surface — absent entirely in the reference (single-input dataflow,
  * SURVEY.md §2.C joins row); built here as the ➕ extension across the
  * TPC-H-ish star.
  *
  * Scale notes (100 TB): dimension tables (region/nation/part/supplier/
  * customer) are broadcast — `broadcast()` hints keep the big fact table
  * shuffle-free on the probe side. Fact-fact joins (orders⋈lineitem) shuffle
  * on the join key; AQE handles skew. `.explain` on these plans shows
  * BroadcastHashJoin for every dim side and SortMergeJoin/ShuffledHashJoin
  * only between facts.
  */
object JoinQueries {

  /** Inner equi-join chain with broadcast dims: revenue per nation. */
  def joinInnerAgg(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val o = Tables.orders(s, d)
    val c = Tables.customer(s, d)
    val n = Tables.nation(s, d)
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(n("n_name").as("nation"))
      // revenue as per-row e4 micro-units summed as BIGINT (the r7/r8
      // money-sum discipline): round-after-double-sum diverged from the
      // oracle in the 11th significant digit at sf100 (~6e8 joined rows
      // per nation) — caught by the r9 sf100 gate, same class as the
      // q_tpch_q1 harvest. price·(1−disc) has ≤4 decimals, so e4 is exact;
      // headroom ~800× below int64 at sf100.
      .agg(sum(Money.e4(col("l_extendedprice") * (lit(1) - col("l_discount"))))
          .as("revenue_e4"),
        count(lit(1)).as("cnt"))
      .orderBy("nation")
  }

  /** LEFT OUTER join: every order, with its lineitem count (0 when none). */
  def joinLeft(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val li = Tables.lineitem(s, d)
    o.join(li, o("o_orderkey") === li("l_orderkey"), "left")
      .groupBy(o("o_orderkey").as("o_orderkey"))
      .agg(count(li("l_orderkey")).as("n_items"),
        round(coalesce(sum(li("l_quantity")), lit(0.0)), 2).as("sum_qty"))
      .orderBy("o_orderkey")
  }

  /** FULL OUTER join: parts vs per-part order stats — nulls on both sides. */
  def joinFull(s: SparkSession, d: String): DataFrame = {
    val p = Tables.part(s, d).filter(col("p_size") >= 40).select("p_partkey", "p_size")
    val li = Tables.lineitem(s, d).filter(col("l_quantity") >= 48)
      .groupBy("l_partkey").agg(count(lit(1)).as("n_li"))
    p.join(li, p("p_partkey") === li("l_partkey"), "full")
      .select(col("p_partkey"), col("p_size"), col("l_partkey"), col("n_li"))
      .orderBy(col("p_partkey").asc_nulls_first, col("l_partkey").asc_nulls_first)
  }

  /** LEFT SEMI (EXISTS): customers with at least one high-value order. */
  def joinSemi(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d).filter(col("o_totalprice") > 200000)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  /** LEFT ANTI (NOT EXISTS): parts that were never ordered. */
  def joinAnti(s: SparkSession, d: String): DataFrame = {
    val p = Tables.part(s, d)
    val li = Tables.lineitem(s, d)
    p.join(li, p("p_partkey") === li("l_partkey"), "left_anti")
      .select("p_partkey", "p_name")
      .orderBy("p_partkey")
  }

  /** Theta join: equi key + non-equi residual (shipped strictly after order
    * date + N days). Catalyst plans the equi part as the join key and keeps
    * the range predicate as a post-join filter — no nested loop.
    */
  def joinTheta(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val o = Tables.orders(s, d)
    li.join(o, li("l_orderkey") === o("o_orderkey") &&
        li("l_shipdate") > o("o_orderdate") + expr("INTERVAL 100 DAYS"))
      .groupBy(o("o_orderstatus").as("o_orderstatus"))
      .agg(count(lit(1)).as("late_items"))
      .orderBy("o_orderstatus")
  }

  /** Pure non-equi (range) join on tiny inputs — BroadcastNestedLoopJoin,
    * safe only because both sides are dimension-scale.
    */
  def joinRange(s: SparkSession, d: String): DataFrame = {
    val n1 = Tables.nation(s, d).select(col("n_nationkey").as("a"))
    val n2 = Tables.nation(s, d).select(col("n_nationkey").as("b"))
    n1.join(n2, col("a") < col("b")).groupBy("a")
      .agg(count(lit(1)).as("n_greater"))
      .orderBy("a")
  }

  /** TPC-H Q3-style: top 10 highest-revenue open orders for a segment. */
  def tpchQ3(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(s, d).filter(col("o_orderdate") < lit("1995-03-15"))
    val li = Tables.lineitem(s, d).filter(col("l_shipdate") > lit("1995-03-15"))
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy(o("o_orderkey").as("o_orderkey"), o("o_orderdate").as("o_orderdate"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5-style: revenue per nation within one region+year, 6-table. */
  def tpchQ5(s: SparkSession, d: String): DataFrame = {
    val r = Tables.region(s, d).filter(col("r_name") === "ASIA")
    val n = Tables.nation(s, d)
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1995-01-01") && col("o_orderdate") < lit("1996-01-01"))
    val li = Tables.lineitem(s, d)
    val su = Tables.supplier(s, d)
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(su, li("l_suppkey") === su("s_suppkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey") &&
        su("s_nationkey") === c("c_nationkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(n("n_name").as("nation"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("nation"))
  }

  /** TPC-H Q6: single-pass filtered scalar aggregate. */
  def tpchQ6(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1995-01-01") &&
        col("l_shipdate") < lit("1996-01-01") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"))

  /** SHUFFLE_HASH-hinted join — the third physical equi-join strategy
    * (broadcast and sort-merge are exercised elsewhere): the hint forces a
    * ShuffledHashJoin, which beats sort-merge when one side is much
    * smaller than the other but too big to broadcast — it builds a hash
    * map per partition instead of sorting BOTH sides. Orders is the build
    * side here (smaller than lineitem by the basket factor). Plan pinned
    * in PlanShapeSpec; strategy whitelisted in PlanAuditSpec because the
    * shuffle IS the demonstration.
    */
  def shuffleHashJoin(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d).hint("SHUFFLE_HASH"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("cnt"),
        sum(round(col("l_extendedprice") * 100).cast("long")).as("sum_price_c"))
      .orderBy("o_orderpriority")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_shuffle_hash_join" -> (shuffleHashJoin(_, _)),
    "q_join_inner_agg" -> (joinInnerAgg(_, _)),
    "q_join_left" -> (joinLeft(_, _)),
    "q_join_full" -> (joinFull(_, _)),
    "q_join_semi" -> (joinSemi(_, _)),
    "q_join_anti" -> (joinAnti(_, _)),
    "q_join_theta" -> (joinTheta(_, _)),
    "q_join_range" -> (joinRange(_, _)),
    "q_tpch_q3" -> (tpchQ3(_, _)),
    "q_tpch_q5" -> (tpchQ5(_, _)),
    "q_tpch_q6" -> (tpchQ6(_, _))
  )

  val oracles: Map[String, String] = Map(
    "q_shuffle_hash_join" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS cnt,
        |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
        |            AS BIGINT) AS sum_price_c
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_join_inner_agg" ->
      """SELECT n_name AS nation,
        |       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
        |                     AS BIGINT)) AS BIGINT) AS revenue_e4,
        |       count(*) AS cnt
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY nation""".stripMargin,
    "q_join_left" ->
      """SELECT o_orderkey, count(l_orderkey) AS n_items,
        |       round(coalesce(sum(l_quantity), 0), 2) AS sum_qty
        |FROM orders LEFT JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_orderkey ORDER BY o_orderkey""".stripMargin,
    "q_join_full" ->
      """SELECT p_partkey, p_size, l_partkey, n_li
        |FROM (SELECT p_partkey, p_size FROM part WHERE p_size >= 40) p
        |FULL JOIN (SELECT l_partkey, count(*) AS n_li FROM lineitem
        |           WHERE l_quantity >= 48 GROUP BY l_partkey) li
        |  ON p.p_partkey = li.l_partkey
        |ORDER BY p_partkey ASC NULLS FIRST, l_partkey ASC NULLS FIRST""".stripMargin,
    "q_join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 200000)
        |ORDER BY c_custkey""".stripMargin,
    "q_join_anti" ->
      """SELECT p_partkey, p_name FROM part
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
        |ORDER BY p_partkey""".stripMargin,
    "q_join_theta" ->
      """SELECT o_orderstatus, count(*) AS late_items
        |FROM lineitem JOIN orders
        |  ON l_orderkey = o_orderkey
        | AND l_shipdate > o_orderdate + INTERVAL 100 DAY
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q_join_range" ->
      """SELECT n1.n_nationkey AS a, count(*) AS n_greater
        |FROM nation n1 JOIN nation n2 ON n1.n_nationkey < n2.n_nationkey
        |GROUP BY a ORDER BY a""".stripMargin,
    "q_tpch_q3" ->
      """SELECT o_orderkey, o_orderdate,
        |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1995-03-15'
        |  AND l_shipdate > TIMESTAMP '1995-03-15'
        |GROUP BY o_orderkey, o_orderdate
        |ORDER BY revenue DESC, o_orderkey
        |LIMIT 10""".stripMargin,
    "q_tpch_q5" ->
      """SELECT n_name AS nation,
        |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey AND s_nationkey = c_nationkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1995-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-01-01'
        |GROUP BY n_name ORDER BY revenue DESC, nation""".stripMargin,
    "q_tpch_q6" ->
      """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01'
        |  AND l_shipdate < TIMESTAMP '1996-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin
  )
}
