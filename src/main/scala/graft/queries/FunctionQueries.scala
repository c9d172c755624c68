package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar-function surface: string / date-time / math / array / JSON /
  * pivot. The reference's entire scalar vocabulary is split-on-char-class +
  * lowercase + substring-contains + u64 add (SURVEY.md §2.C); these queries
  * are the ➕ extension over the driver tables. All codegen'd builtins —
  * no UDFs anywhere (SURVEY.md §4 "functions, not UDFs").
  */
object FunctionQueries {

  /** String functions on part names. */
  def stringFuncs(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .select(
        col("p_partkey"),
        upper(col("p_name")).as("uname"),
        length(col("p_name")).as("name_len"),
        substring(col("p_name"), 1, 5).as("prefix"),
        regexp_extract(col("p_name"), "^(\\w+)", 1).as("first_word"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
        regexp_replace(col("p_name"), "[aeiou]", "").as("no_vowels"))
      .orderBy("p_partkey")

  /** Date/time functions on orders. */
  def dateFuncs(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("y"),
        month(col("o_orderdate")).cast("long").as("m"),
        dayofmonth(col("o_orderdate")).cast("long").as("dom"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        datediff(col("o_orderdate"), lit("1995-01-01").cast("date")).cast("long").as("days_since"))
      .orderBy("o_orderkey")

  /** Math functions on lineitem prices. */
  def mathFuncs(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_orderkey") < 500)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        round(abs(col("l_extendedprice") - 30000), 2).as("abs_diff"),
        ceil(col("l_discount") * 100).as("disc_pct_ceil"),
        floor(col("l_quantity") / 10).cast("long").as("qty_decile"),
        round(sqrt(col("l_extendedprice")), 4).as("sqrt_price"),
        round(log(col("l_extendedprice")), 4).as("ln_price"),
        round(pow(col("l_tax") + 1, 2), 6).as("tax_sq"))
      .orderBy("l_orderkey", "l_linenumber")

  /** Array functions: per-order collected + sorted lineitem structure.
    * Arrays are materialized as joined strings so the cross-engine compare
    * stays on scalar columns.
    */
  def arrayFuncs(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(
        array_join(sort_array(collect_list(col("l_linenumber"))), ",").as("line_numbers"),
        size(collect_list(col("l_linenumber"))).cast("long").as("n_lines"),
        array_contains(collect_list(col("l_linenumber")), 7).as("has_line7"))
      .orderBy("l_orderkey")

  /** JSON extraction from the events.props payload. */
  def jsonFuncs(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .orderBy("event_id")

  /** The Spark 4 VARIANT path: parse_json to the shredded binary VARIANT
    * type, typed extraction via variant_get — the semi-structured column
    * format that replaces string-JSON re-parsing per access. At 100 TB
    * variant columns shred once at ingest and every downstream access is
    * a binary field read, not a parse; this query pins the surface (and
    * its null/typing rules) under the oracle gate.
    */
  def variantFuncs(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("v", expr("parse_json(props)"))
      .select(col("event_type"),
        expr("variant_get(v, '$.k', 'long')").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("k").as("sum_k"),
        min("k").as("min_k"), max("k").as("max_k"))
      .orderBy("event_type")

  /** Pivot: event counts per user across the five event types. */
  def pivotEvents(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy("user_id")
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy("user_id")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_string_funcs" -> (stringFuncs(_, _)),
    "q_date_funcs" -> (dateFuncs(_, _)),
    "q_math_funcs" -> (mathFuncs(_, _)),
    "q_array_funcs" -> (arrayFuncs(_, _)),
    "q_json_funcs" -> (jsonFuncs(_, _)),
    "q_variant" -> (variantFuncs(_, _)),
    "q_pivot_events" -> (pivotEvents(_, _))
  )

  val oracles: Map[String, String] = Map(
    "q_string_funcs" ->
      """SELECT p_partkey, upper(p_name) AS uname,
        |       CAST(length(p_name) AS INT) AS name_len,
        |       substring(p_name, 1, 5) AS prefix,
        |       regexp_extract(p_name, '^(\w+)', 1) AS first_word,
        |       concat_ws('|', p_brand, p_type) AS brand_type,
        |       regexp_replace(p_name, '[aeiou]', '', 'g') AS no_vowels
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_date_funcs" ->
      """SELECT o_orderkey,
        |       CAST(year(o_orderdate) AS BIGINT) AS y,
        |       CAST(month(o_orderdate) AS BIGINT) AS m,
        |       CAST(day(o_orderdate) AS BIGINT) AS dom,
        |       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
        |       CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_math_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        |       round(abs(l_extendedprice - 30000), 2) AS abs_diff,
        |       CAST(ceil(l_discount * 100) AS BIGINT) AS disc_pct_ceil,
        |       CAST(floor(l_quantity / 10) AS BIGINT) AS qty_decile,
        |       round(sqrt(l_extendedprice), 4) AS sqrt_price,
        |       round(ln(l_extendedprice), 4) AS ln_price,
        |       round(pow(l_tax + 1, 2), 6) AS tax_sq
        |FROM lineitem WHERE l_orderkey < 500
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_array_funcs" ->
      """SELECT l_orderkey,
        |       string_agg(l_linenumber, ',' ORDER BY l_linenumber) AS line_numbers,
        |       count(*) AS n_lines,
        |       bool_or(l_linenumber = 7) AS has_line7
        |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin,
    "q_variant" ->
      """WITH e AS (
        |  SELECT event_type,
        |         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |  FROM events)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(k) AS BIGINT) AS sum_k,
        |       min(k) AS min_k, max(k) AS max_k
        |FROM e GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_json_funcs" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events ORDER BY event_id""".stripMargin,
    "q_pivot_events" ->
      """SELECT user_id,
        |       count(*) FILTER (WHERE event_type = 'click') AS click,
        |       count(*) FILTER (WHERE event_type = 'error') AS error,
        |       count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        |       count(*) FILTER (WHERE event_type = 'signup') AS signup,
        |       count(*) FILTER (WHERE event_type = 'view') AS "view"
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin
  )
}
