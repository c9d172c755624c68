package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Filters, projections, aggregations, grouping sets, distinct and set
  * operations on the driver star schema — the ➕ relational rows of
  * SURVEY.md §2.C. The reference engine's only aggregation is sort-based
  * group-by-sum (/root/reference/src/worker/mod.rs:126-136); everything here
  * is its generalization through Catalyst's partial+final hash aggregate.
  *
  * Every query is fully deterministic (total ORDER BY) and every float
  * aggregate is rounded in both engines, so the driver's hash compare is
  * stable. Aggregates are aliased identically in Spark and oracle SQL.
  */
object RelationalQueries {

  /** Range + equality predicates pushed to the parquet scan. */
  def filterRange(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1995-01-01") &&
        col("l_shipdate") < lit("1996-01-01") &&
        col("l_discount").between(0.05, 0.07))
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_shipdate")
      .orderBy("l_orderkey", "l_linenumber")

  /** IN-list + IS NOT NULL predicates. */
  def filterIsin(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_returnflag").isin("A", "R") && col("l_quantity").isNotNull &&
        col("l_quantity") >= 45)
      .select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity")
      .orderBy("l_orderkey", "l_linenumber")

  /** Computed projection (TPC-H charge expression). Raw doubles, no
    * rounding: both engines evaluate the identical IEEE expression tree, so
    * full precision is exactly comparable — rounding would only introduce
    * half-rule drift (Spark HALF_UP on BigDecimal vs DuckDB's float round).
    */
  def projectCompute(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_orderkey") < 1000)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("disc_price"),
        (col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))).as("charge"))
      .orderBy("l_orderkey", "l_linenumber")

  /** TPC-H Q1 pricing summary: multi-aggregate over two group keys.
    * Money totals are exact integer sums (cents / e4 micro-units for the
    * 4-decimal discounted price) per the q_tpch_q9 fixed-point discipline:
    * the r8 sf10 sweep caught round(sum(double),2) flipping the last cent
    * on the ~10M-row per-(flag,status) strata — order-dependent under any
    * partitioning. Quantities and averages stay double: l_quantity is
    * integer-valued (every partial sum is exact), and the 4-dp averages
    * sit ~6 orders of magnitude above the accumulated ulp error. */
  def aggBasic(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        sum(round(col("l_extendedprice") * 100).cast("long")).as("sum_base_c"),
        sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 10000)
          .cast("long")).as("sum_disc_e4"),
        round(avg("l_quantity"), 4).as("avg_qty"),
        round(avg("l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("cnt"))
      .orderBy("l_returnflag", "l_linestatus")

  /** COUNT(DISTINCT) — exact distinct aggregation (expand + two-phase agg). */
  def aggDistinct(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        countDistinct(col("l_partkey")).as("nd_part"),
        countDistinct(col("l_suppkey")).as("nd_supp"),
        count(lit(1)).as("cnt"))
      .orderBy("l_returnflag")

  /** HAVING — post-aggregation predicate. */
  def aggHaving(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy("l_partkey")
      .agg(round(sum("l_quantity"), 2).as("sum_qty"), count(lit(1)).as("cnt"))
      .filter(col("sum_qty") > 150)
      .orderBy("l_partkey")

  /** CASE WHEN bucketing feeding an aggregation. */
  def caseWhen(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(col("o_orderstatus"),
        when(col("o_totalprice") < 50000, "low")
          .when(col("o_totalprice") < 150000, "mid")
          .otherwise("high").as("bucket"))
      .groupBy("o_orderstatus", "bucket")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("o_orderstatus", "bucket")

  /** ROLLUP with grouping_id — hierarchical subtotals. */
  def rollupAgg(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .rollup("l_returnflag", "l_linestatus")
      .agg(round(sum("l_quantity"), 2).as("sum_qty"), count(lit(1)).as("cnt"),
        grouping_id().as("gid"))
      .orderBy("gid", "l_returnflag", "l_linestatus")

  /** CUBE over two dimensions. Price totals are per-row BIGINT cents
    * summed exactly (the q_tpch_q9 fixed-point discipline): the r8 sf10
    * sweep caught `round(sum(double), 2)` flipping the last cent on the
    * 15M-row grand-total cells — order-dependent under ANY partitioning,
    * so the rounding moves BEFORE the (commutative, exact) integer sum. */
  def cubeAgg(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .cube("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("cnt"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("sum_price_c"),
        grouping_id().as("gid"))
      .orderBy("gid", "o_orderstatus", "o_orderpriority")

  /** DISTINCT projection. */
  def distinctPairs(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select("l_returnflag", "l_linestatus").distinct()
      .orderBy("l_returnflag", "l_linestatus")

  /** Shared by the set-op queries here and the multiset ops in MiscQueries. */
  private[queries] def lnParts(s: SparkSession, d: String, ln: Int): DataFrame =
    Tables.lineitem(s, d).filter(col("l_linenumber") === ln).select("l_partkey")

  /** UNION (set semantics — dedup across inputs). */
  def setUnion(s: SparkSession, d: String): DataFrame =
    lnParts(s, d, 6).union(lnParts(s, d, 7)).distinct().orderBy("l_partkey")

  /** INTERSECT. */
  def setIntersect(s: SparkSession, d: String): DataFrame =
    lnParts(s, d, 6).intersect(lnParts(s, d, 7)).orderBy("l_partkey")

  /** EXCEPT. */
  def setExcept(s: SparkSession, d: String): DataFrame =
    lnParts(s, d, 6).except(lnParts(s, d, 7)).orderBy("l_partkey")

  /** Exact-money aggregation with DECIMAL arithmetic kept strictly
    * INTERNAL to the query: per-row values are anchored to DECIMAL(18,2)
    * (revenue to DECIMAL(18,4) via the exact decimal product), then
    * immediately re-expressed as fixed-point BIGINT — cents for qty and
    * price (×100), 1e-4 units for revenue (×10000) — so every OUTPUT
    * column is a scalar BIGINT. Sums of fixed-point longs are exact and
    * order-independent (no distributed-float-sum trap; cf.
    * ml_linreg_ols's power sums). Rationale for the no-DECIMAL-output
    * rule: three driver rounds (r4 HUGEINT, r5 DECIMAL(28,x), r6
    * DECIMAL(18,x)) each hash-failed on a value-equal DECIMAL-typed
    * output, proving the driver's canonicalization diverges on the
    * DECIMAL storage class itself regardless of precision. The oracle
    * mirrors the ×100/×10000 fixed-point casts and re-casts its sums to
    * BIGINT (DuckDB sum(BIGINT) widens to HUGEINT — the r4 class).
    * Fixed-point multiply-then-cast is exact on both engines: the scaled
    * decimal value is an integer, so truncation (Spark) and rounding
    * (DuckDB) casts agree. Sums at any test SF fit in int64 with ~5
    * digits of headroom (sf1 revenue sum ≈ 1e14 × 1e4 = 1e18 < 2^63).
    */
  def decimalMoney(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d).select(
      col("l_returnflag"), col("l_linestatus"),
      (col("l_quantity").cast("decimal(18,2)") * lit(100)).cast("long").as("qty_cents"),
      (col("l_extendedprice").cast("decimal(18,2)") * lit(100)).cast("long").as("price_cents"),
      ((col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)"))
            .cast("decimal(18,2)"))
        .cast("decimal(18,4)") * lit(10000)).cast("long").as("revenue_e4"))
    li.groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"),
        sum(col("qty_cents")).as("sum_qty_cents"),
        sum(col("price_cents")).as("sum_price_cents"),
        sum(col("revenue_e4")).as("sum_revenue_e4"),
        min(col("revenue_e4")).as("min_revenue_e4"),
        max(col("revenue_e4")).as("max_revenue_e4"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_decimal_money" -> (decimalMoney(_, _)),
    "q_filter_range" -> (filterRange(_, _)),
    "q_filter_isin" -> (filterIsin(_, _)),
    "q_project_compute" -> (projectCompute(_, _)),
    "q_agg_basic" -> (aggBasic(_, _)),
    "q_agg_distinct" -> (aggDistinct(_, _)),
    "q_agg_having" -> (aggHaving(_, _)),
    "q_case_when" -> (caseWhen(_, _)),
    "q_rollup" -> (rollupAgg(_, _)),
    "q_cube" -> (cubeAgg(_, _)),
    "q_distinct" -> (distinctPairs(_, _)),
    "q_set_union" -> (setUnion(_, _)),
    "q_set_intersect" -> (setIntersect(_, _)),
    "q_set_except" -> (setExcept(_, _))
  )

  val oracles: Map[String, String] = Map(
    "q_decimal_money" ->
      """WITH li AS (
        |  SELECT l_returnflag, l_linestatus,
        |         CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS qty_cents,
        |         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS price_cents,
        |         CAST(CAST((CAST(l_extendedprice AS DECIMAL(18,2))
        |                    * CAST(1 - CAST(l_discount AS DECIMAL(18,2))
        |                           AS DECIMAL(18,2)))
        |                   AS DECIMAL(18,4)) * 10000 AS BIGINT) AS revenue_e4
        |  FROM lineitem)
        |SELECT l_returnflag, l_linestatus,
        |       CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(qty_cents) AS BIGINT) AS sum_qty_cents,
        |       CAST(sum(price_cents) AS BIGINT) AS sum_price_cents,
        |       CAST(sum(revenue_e4) AS BIGINT) AS sum_revenue_e4,
        |       min(revenue_e4) AS min_revenue_e4,
        |       max(revenue_e4) AS max_revenue_e4
        |FROM li GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_filter_range" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_shipdate
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1996-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_filter_isin" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity
        |FROM lineitem
        |WHERE l_returnflag IN ('A','R') AND l_quantity IS NOT NULL AND l_quantity >= 45
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_project_compute" ->
      """SELECT l_orderkey, l_linenumber,
        |       l_extendedprice * (1 - l_discount) AS disc_price,
        |       l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge
        |FROM lineitem WHERE l_orderkey < 1000
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_agg_basic" ->
      """SELECT l_returnflag, l_linestatus,
        |       round(sum(l_quantity), 2) AS sum_qty,
        |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
        |         AS sum_base_c,
        |       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
        |                     AS BIGINT)) AS BIGINT) AS sum_disc_e4,
        |       round(avg(l_quantity), 4) AS avg_qty,
        |       round(avg(l_discount), 4) AS avg_disc,
        |       count(*) AS cnt
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_agg_distinct" ->
      """SELECT l_returnflag,
        |       count(DISTINCT l_partkey) AS nd_part,
        |       count(DISTINCT l_suppkey) AS nd_supp,
        |       count(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_agg_having" ->
      """SELECT l_partkey, round(sum(l_quantity), 2) AS sum_qty, count(*) AS cnt
        |FROM lineitem GROUP BY l_partkey
        |HAVING round(sum(l_quantity), 2) > 150
        |ORDER BY l_partkey""".stripMargin,
    "q_case_when" ->
      """SELECT o_orderstatus,
        |       CASE WHEN o_totalprice < 50000 THEN 'low'
        |            WHEN o_totalprice < 150000 THEN 'mid'
        |            ELSE 'high' END AS bucket,
        |       count(*) AS cnt
        |FROM orders GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |       round(sum(l_quantity), 2) AS sum_qty, count(*) AS cnt,
        |       CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag, l_linestatus""".stripMargin,
    "q_cube" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS cnt,
        |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |         AS sum_price_c,
        |       CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY gid, o_orderstatus, o_orderpriority""".stripMargin,
    "q_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_set_union" ->
      """SELECT l_partkey FROM lineitem WHERE l_linenumber = 6
        |UNION
        |SELECT l_partkey FROM lineitem WHERE l_linenumber = 7
        |ORDER BY l_partkey""".stripMargin,
    "q_set_intersect" ->
      """SELECT l_partkey FROM lineitem WHERE l_linenumber = 6
        |INTERSECT
        |SELECT l_partkey FROM lineitem WHERE l_linenumber = 7
        |ORDER BY l_partkey""".stripMargin,
    "q_set_except" ->
      """SELECT l_partkey FROM lineitem WHERE l_linenumber = 6
        |EXCEPT
        |SELECT l_partkey FROM lineitem WHERE l_linenumber = 7
        |ORDER BY l_partkey""".stripMargin
  )
}
