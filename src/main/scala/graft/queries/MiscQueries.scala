package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Remaining SQL-surface coverage: scalar + lateral subqueries, multiset set
  * ops, OFFSET pagination, error-safe try_* functions, JSON struct
  * round-trips, sequence generation, unpivot/melt.
  */
object MiscQueries {

  /** Correlated-free scalar subquery feeding a predicate. */
  def scalarSubquery(s: SparkSession, d: String): DataFrame = {
    Tables.orders(s, d).createOrReplaceTempView("orders_sq")
    s.sql(
      """SELECT o_orderkey, o_totalprice
        |FROM orders_sq
        |WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders_sq) * 1.5
        |ORDER BY o_orderkey""".stripMargin)
  }

  /** LATERAL subquery: top-2 nations per region, correlated inner query. */
  def lateralJoin(s: SparkSession, d: String): DataFrame = {
    Tables.region(s, d).createOrReplaceTempView("region_lv")
    Tables.nation(s, d).createOrReplaceTempView("nation_lv")
    s.sql(
      """SELECT r_name, n_name
        |FROM region_lv,
        |LATERAL (SELECT n_name FROM nation_lv
        |         WHERE n_regionkey = r_regionkey
        |         ORDER BY n_name LIMIT 2)
        |ORDER BY r_name, n_name""".stripMargin)
  }

  private def lnParts(s: SparkSession, d: String, ln: Int): DataFrame =
    RelationalQueries.lnParts(s, d, ln)

  /** INTERSECT ALL — multiset intersection (duplicates preserved). */
  def intersectAll(s: SparkSession, d: String): DataFrame =
    lnParts(s, d, 5).intersectAll(lnParts(s, d, 6)).orderBy("l_partkey")

  /** EXCEPT ALL — multiset difference. */
  def exceptAll(s: SparkSession, d: String): DataFrame =
    lnParts(s, d, 5).exceptAll(lnParts(s, d, 6)).orderBy("l_partkey")

  /** ORDER BY + OFFSET + LIMIT pagination. */
  def limitOffset(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .offset(10).limit(15)

  /** Error-safe functions: division by zero and bad casts → NULL, not
    * job failure (the opposite policy from the reference's fail-fast —
    * both policies must be expressible).
    */
  def tryFuncs(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_orderkey") < 200)
      .select(col("l_orderkey"), col("l_linenumber"),
        try_divide(col("l_quantity"), col("l_linenumber") - lit(1)).as("qty_per"),
        try_element_at(split(col("l_returnflag"), ","), lit(5)).as("missing_elem"))
      .orderBy("l_orderkey", "l_linenumber")

  /** from_json with schema → typed struct field. */
  def fromJson(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_id"),
        from_json(col("props"), lit("k INT")).getField("k").cast("long").as("k"))
      .orderBy("event_id")

  /** to_json over a named struct — serialization side. */
  def toJsonQ(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_orderkey") < 100)
      .select(col("l_orderkey"), col("l_linenumber"),
        to_json(struct(col("l_orderkey").as("o"), col("l_returnflag").as("f"))).as("js"))
      .orderBy("l_orderkey", "l_linenumber")

  /** Row generation: explode a per-row sequence (generator with computed
    * bounds).
    */
  def sequenceExplode(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_orderkey") < 100)
      .select(col("l_orderkey"), col("l_linenumber"),
        explode(sequence(lit(1), col("l_linenumber"))).as("i"))
      .groupBy("l_orderkey")
      .agg(count(lit(1)).as("n_rows"), sum("i").as("sum_i"))
      .orderBy("l_orderkey")

  /** Unpivot/melt: wide columns → (attr, val) rows. */
  def unpivotQ(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .select(col("p_partkey"), col("p_brand"), col("p_type"))
      .unpivot(Array(col("p_partkey")), Array(col("p_brand"), col("p_type")),
        "attr", "val")
      .orderBy("p_partkey", "attr")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_scalar_subquery" -> (scalarSubquery(_, _)),
    "q_lateral" -> (lateralJoin(_, _)),
    "q_intersect_all" -> (intersectAll(_, _)),
    "q_except_all" -> (exceptAll(_, _)),
    "q_limit_offset" -> (limitOffset(_, _)),
    "q_try_funcs" -> (tryFuncs(_, _)),
    "q_from_json" -> (fromJson(_, _)),
    "q_to_json" -> (toJsonQ(_, _)),
    "q_sequence" -> (sequenceExplode(_, _)),
    "q_unpivot" -> (unpivotQ(_, _))
  )

  val oracles: Map[String, String] = Map(
    "q_scalar_subquery" ->
      """SELECT o_orderkey, o_totalprice
        |FROM orders
        |WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders) * 1.5
        |ORDER BY o_orderkey""".stripMargin,
    "q_lateral" ->
      """SELECT r_name, n_name
        |FROM region,
        |LATERAL (SELECT n_name FROM nation
        |         WHERE n_regionkey = r_regionkey
        |         ORDER BY n_name LIMIT 2)
        |ORDER BY r_name, n_name""".stripMargin,
    "q_intersect_all" ->
      """SELECT l_partkey FROM lineitem WHERE l_linenumber = 5
        |INTERSECT ALL
        |SELECT l_partkey FROM lineitem WHERE l_linenumber = 6
        |ORDER BY l_partkey""".stripMargin,
    "q_except_all" ->
      """SELECT l_partkey FROM lineitem WHERE l_linenumber = 5
        |EXCEPT ALL
        |SELECT l_partkey FROM lineitem WHERE l_linenumber = 6
        |ORDER BY l_partkey""".stripMargin,
    "q_limit_offset" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 15 OFFSET 10""".stripMargin,
    "q_try_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        |       CASE WHEN l_linenumber - 1 = 0 THEN NULL
        |            ELSE l_quantity / (l_linenumber - 1) END AS qty_per,
        |       CAST(NULL AS VARCHAR) AS missing_elem
        |FROM lineitem WHERE l_orderkey < 200
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_from_json" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events ORDER BY event_id""".stripMargin,
    "q_to_json" ->
      """SELECT l_orderkey, l_linenumber,
        |       CAST(to_json({'o': l_orderkey, 'f': l_returnflag}) AS VARCHAR) AS js
        |FROM lineitem WHERE l_orderkey < 100
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_sequence" ->
      """SELECT l_orderkey, count(*) AS n_rows, CAST(sum(i) AS BIGINT) AS sum_i
        |FROM (SELECT l_orderkey, l_linenumber,
        |             unnest(generate_series(1, l_linenumber)) AS i
        |      FROM lineitem WHERE l_orderkey < 100)
        |GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin,
    "q_unpivot" ->
      """SELECT p_partkey, attr, val FROM (
        |  SELECT p_partkey, 'p_brand' AS attr, p_brand AS val FROM part
        |  UNION ALL
        |  SELECT p_partkey, 'p_type' AS attr, p_type AS val FROM part)
        |ORDER BY p_partkey, attr""".stripMargin
  )
}
