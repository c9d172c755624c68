package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Product-analytics shapes over the star schema + events: salted skew
  * join, column profiling, funnel conversion, cohort retention. All
  * oracle-checked.
  */
object AnalyticsQueries {

  /** Skew-salted JOIN: replicate the (small) build side across 8 salt
    * values, salt the probe side by a uniform hash of its row identity, join
    * on (key, salt). Same rows as the plain join — same oracle — but a hot
    * key's probe rows now spread over 8 tasks instead of one. The pattern
    * for power-law join keys too big for one reducer when broadcast isn't
    * available (both sides huge).
    */
  def saltedJoin(s: SparkSession, d: String): DataFrame = {
    val salts = 8
    val li = Tables.lineitem(s, d)
      .withColumn("salt", pmod(col("l_orderkey") * 31 + col("l_linenumber"), lit(salts)))
    val o = Tables.orders(s, d)
      .withColumn("salt", explode(sequence(lit(0), lit(salts - 1))))
    li.join(o, li("l_orderkey") === o("o_orderkey") && li("salt") === o("salt"))
      .groupBy(o("o_orderpriority").as("o_orderpriority"))
      .agg(count(lit(1)).as("cnt"), round(sum("l_quantity"), 2).as("sum_qty"))
      .orderBy("o_orderpriority")
  }

  /** Column profiling: null rate + distinct count per profiled column in one
    * pass — the data-quality sweep every ingest pipeline runs first.
    */
  def profileNulls(s: SparkSession, d: String): DataFrame = {
    val cols = Seq("l_returnflag", "l_linestatus", "l_shipdate", "l_quantity")
    val aggs = cols.flatMap { c =>
      Seq(count(when(col(c).isNull, 1)).as(s"${c}_nulls"),
        countDistinct(col(c)).as(s"${c}_distinct"))
    }
    Tables.lineitem(s, d).agg(count(lit(1)).as("n_rows"), aggs: _*)
  }

  /** Funnel: per user, first click → first purchase after it → converted
    * flag; aggregated to funnel counts. One window pass, no self-join.
    */
  def funnel(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val perUser = ev.groupBy("user_id")
      .agg(
        min(when(col("event_type") === "click", col("ts"))).as("first_click"),
        count(when(col("event_type") === "click", 1)).as("n_clicks"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"))
    perUser.join(purchases, Seq("user_id"), "left")
      .groupBy(col("user_id"), col("first_click"), col("n_clicks"))
      .agg(min(when(col("p_ts") > col("first_click"), col("p_ts"))).as("first_purchase_after"))
      .select(col("user_id"),
        col("first_click").cast("long").as("first_click"),
        col("n_clicks"),
        col("first_purchase_after").cast("long").as("first_purchase_after"),
        (col("first_click").isNotNull && col("first_purchase_after").isNotNull).as("converted"))
      .orderBy("user_id")
  }

  /** Cohort retention: users grouped by first-activity day; per (cohort,
    * day) distinct active users — the classic retention triangle.
    */
  def cohortRetention(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("user_id"), (col("ts").cast("long") / 86400L).cast("long").as("day"))
    val cohorts = ev.groupBy("user_id").agg(min("day").as("cohort_day"))
    ev.join(cohorts, "user_id")
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
      .agg(countDistinct(col("user_id")).as("active_users"))
      .orderBy("cohort_day", "day_offset")
  }

  /** Manual bloom-filter semi-join reduction — the explicit form of the
    * runtime bloom pruning PlanShapeSpec demonstrates Spark injecting
    * automatically: build a bloom filter over the selective build side's
    * keys (one ~50 KB sketch, shipped as a literal — the persistable
    * cross-job form), drop probe rows that cannot join BEFORE the
    * exchange, then run the real join (which erases the bloom's false
    * positives — the result is exact regardless of fpp, which is why the
    * oracle is the plain join). The manual form matters at 100 TB when
    * you want to control NDV/fpp or persist the filter across jobs; the
    * probe side sheds ~97% of its rows pre-shuffle here.
    */
  def bloomPrejoin(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.GraftSqlBridge.{column, expression}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
    import org.apache.spark.sql.catalyst.expressions.Literal
    // the same expressions InjectRuntimeFilter plants, built explicitly
    // (they are optimizer-internal, not in the SQL function registry)
    def bloomAgg(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      column(new BloomFilterAggregate(expression(c),
        Literal(50000L), Literal(400000L)).toAggregateExpression())
    def mightContain(bf: org.apache.spark.sql.Column,
        v: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      column(BloomFilterMightContain(expression(bf), expression(v)))
    val sel = Tables.orders(s, d)
      .filter(col("o_orderpriority") === "1-URGENT" && col("o_totalprice") > 300000)
      .select(col("o_orderkey"), col("o_custkey"))
    // might_contain requires a CONSTANT filter (or scalar subquery): one
    // ~50 KB sketch materialized driver-side and shipped as a literal —
    // the persistable, cross-job-reusable form of the filter
    val bfBytes = sel.agg(bloomAgg(col("o_orderkey")).as("bf"))
      .head.getAs[Array[Byte]](0)
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_extendedprice"))
      .filter(mightContain(lit(bfBytes), col("l_orderkey")))
      .join(sel, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("l_extendedprice")), 2).as("sum_price"))
      .orderBy("o_custkey")
  }

  /** Incremental aggregate maintenance (materialized-view algebra): the
    * "stored" base partials cover events older than (max ts − 1 day), the
    * delta partials cover the last day, and the serving result is the
    * MERGE of the two partial-aggregate relations — sums add, counts add,
    * min/max fold — re-aggregated by key. The gate proves merge ≡ full
    * recompute (the DuckDB oracle is the one-shot aggregate).
    *
    * Scale: this is how a 100 TB rolling metric actually runs — each
    * period aggregates ONLY its delta (linear in new data) and merges
    * kilobyte-sized partials with the stored state; nothing ever re-scans
    * history. Every aggregate here is chosen re-aggregable: value is
    * cent-scaled to BIGINT so partial-then-merge addition is exact under
    * any grouping order (a raw double sum would drift bits between merge
    * orders); the serving layer derives sum/avg from the exact cents.
    */
  def incrementalAgg(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(col("event_type"), col("ts"),
      round(col("value") * 100).cast("long").as("cents"))
    val cutoff = ev.agg((max(col("ts")).cast("long") - 86400L).as("cut_s"))
    val tagged = ev.crossJoin(broadcast(cutoff))
    def partial(df: DataFrame): DataFrame =
      df.groupBy("event_type").agg(
        count(lit(1)).as("cnt"), sum(col("cents")).as("cents_sum"),
        min(col("cents")).as("min_cents"), max(col("cents")).as("max_cents"))
    val base = partial(tagged.filter(col("ts").cast("long") < col("cut_s")))
    val delta = partial(tagged.filter(col("ts").cast("long") >= col("cut_s")))
    base.unionByName(delta)
      .groupBy("event_type")
      .agg(sum(col("cnt")).as("cnt"), sum(col("cents_sum")).as("cents_sum"),
        min(col("min_cents")).as("min_cents"), max(col("max_cents")).as("max_cents"))
      .select(col("event_type"), col("cnt"), col("cents_sum"),
        col("min_cents"), col("max_cents"),
        (col("cents_sum") / 100.0).as("sum_value"),
        (col("cents_sum").cast("double") / col("cnt")).as("avg_cents"))
      .orderBy("event_type")
  }

  /** Gaps-and-islands: longest consecutive-DAY activity streak per user —
    * the canonical islands pattern (day_number − row_number is constant
    * within a run of consecutive days). One shuffle on user_id; island
    * detection and length aggregation happen inside the partition. Day
    * numbers are exact integer date arithmetic on both engines.
    */
  def streaks(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val days = Tables.events(s, d)
      .select(col("user_id"),
        datediff(to_date(col("ts")), lit("1970-01-01")).as("day_num"))
      .distinct()
    val w = Window.partitionBy("user_id").orderBy("day_num")
    days
      .withColumn("grp", col("day_num") - row_number().over(w))
      .groupBy("user_id", "grp").agg(count(lit(1)).as("len"))
      .groupBy("user_id")
      .agg(sum(col("len")).as("active_days"),
        count(lit(1)).as("n_streaks"),
        max(col("len")).as("longest_streak"))
      .orderBy("user_id")
  }

  /** View→purchase conversion latency per user: first view timestamp,
    * first purchase AT OR AFTER it, and the exact µs gap — the funnel's
    * time dimension (q_funnel counts stages; this measures them). The
    * first-view anchor is an unordered full-partition window min
    * (deterministic), so the whole thing costs one shuffle on user_id
    * plus the final per-user aggregate.
    */
  def conversionLatency(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val uw = Window.partitionBy("user_id")
    Tables.events(s, d)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      .withColumn("first_view_us",
        min(when(col("event_type") === "view", col("us"))).over(uw))
      .filter(col("event_type") === "purchase" &&
        col("us") >= col("first_view_us"))
      .groupBy("user_id")
      .agg(min(col("first_view_us")).as("first_view_us"),
        min(col("us")).as("first_purch_us"))
      .withColumn("latency_us", col("first_purch_us") - col("first_view_us"))
      .orderBy("user_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_streaks" -> (streaks(_, _)),
    "q_conversion_latency" -> (conversionLatency(_, _)),
    "q_incremental_agg" -> (incrementalAgg(_, _)),
    "q_salted_join" -> (saltedJoin(_, _)),
    "q_profile_nulls" -> (profileNulls(_, _)),
    "q_funnel" -> (funnel(_, _)),
    "q_cohort_retention" -> (cohortRetention(_, _)),
    "q_bloom_prejoin" -> (bloomPrejoin(_, _))
  )

  val oracles: Map[String, String] = Map(
    "q_streaks" ->
      """WITH days AS (
        |  SELECT DISTINCT user_id,
        |         CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS INT) AS day_num
        |  FROM events),
        |grp AS (
        |  SELECT user_id,
        |         day_num - CAST(row_number() OVER (PARTITION BY user_id
        |                        ORDER BY day_num) AS INT) AS g
        |  FROM days),
        |runs AS (SELECT user_id, g, CAST(count(*) AS BIGINT) AS len
        |         FROM grp GROUP BY 1, 2)
        |SELECT user_id, CAST(sum(len) AS BIGINT) AS active_days,
        |       CAST(count(*) AS BIGINT) AS n_streaks,
        |       CAST(max(len) AS BIGINT) AS longest_streak
        |FROM runs GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_conversion_latency" ->
      """WITH e AS (
        |  SELECT user_id, event_type,
        |         epoch_us(CAST(ts AS TIMESTAMP)) AS us,
        |         min(CASE WHEN event_type = 'view' THEN
        |               epoch_us(CAST(ts AS TIMESTAMP)) END)
        |           OVER (PARTITION BY user_id) AS first_view_us
        |  FROM events)
        |SELECT user_id, CAST(min(first_view_us) AS BIGINT) AS first_view_us,
        |       CAST(min(us) AS BIGINT) AS first_purch_us,
        |       CAST(min(us) - min(first_view_us) AS BIGINT) AS latency_us
        |FROM e WHERE event_type = 'purchase' AND us >= first_view_us
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_incremental_agg" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS cnt,
        |       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents_sum,
        |       CAST(min(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS min_cents,
        |       CAST(max(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS max_cents,
        |       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) / 100.0 AS sum_value,
        |       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
        |         / count(*) AS avg_cents
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_bloom_prejoin" ->
      """SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_items,
        |       round(sum(l_extendedprice), 2) AS sum_price
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 300000
        |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,
    "q_salted_join" ->
      """SELECT o_orderpriority, count(*) AS cnt, round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_profile_nulls" ->
      """SELECT count(*) AS n_rows,
        |       count(CASE WHEN l_returnflag IS NULL THEN 1 END) AS l_returnflag_nulls,
        |       count(DISTINCT l_returnflag) AS l_returnflag_distinct,
        |       count(CASE WHEN l_linestatus IS NULL THEN 1 END) AS l_linestatus_nulls,
        |       count(DISTINCT l_linestatus) AS l_linestatus_distinct,
        |       count(CASE WHEN l_shipdate IS NULL THEN 1 END) AS l_shipdate_nulls,
        |       count(DISTINCT l_shipdate) AS l_shipdate_distinct,
        |       count(CASE WHEN l_quantity IS NULL THEN 1 END) AS l_quantity_nulls,
        |       count(DISTINCT l_quantity) AS l_quantity_distinct
        |FROM lineitem""".stripMargin,
    "q_funnel" ->
      """WITH per_user AS (
        |  SELECT user_id,
        |         min(CASE WHEN event_type = 'click' THEN ts END) AS first_click,
        |         count(CASE WHEN event_type = 'click' THEN 1 END) AS n_clicks
        |  FROM events GROUP BY user_id),
        |joined AS (
        |  SELECT p.user_id, p.first_click, p.n_clicks,
        |         min(CASE WHEN e.ts > p.first_click THEN e.ts END) AS first_purchase_after
        |  FROM per_user p LEFT JOIN (SELECT user_id, ts FROM events
        |                             WHERE event_type = 'purchase') e
        |    ON p.user_id = e.user_id
        |  GROUP BY p.user_id, p.first_click, p.n_clicks)
        |SELECT user_id,
        |       CAST(floor(epoch(first_click)) AS BIGINT) AS first_click,
        |       n_clicks,
        |       CAST(floor(epoch(first_purchase_after)) AS BIGINT) AS first_purchase_after,
        |       (first_click IS NOT NULL AND first_purchase_after IS NOT NULL) AS converted
        |FROM joined ORDER BY user_id""".stripMargin,
    "q_cohort_retention" ->
      """WITH ev AS (
        |  -- integer // on BIGINT: double // is NOT floor division in DuckDB
        |  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day
        |  FROM events),
        |cohorts AS (SELECT user_id, min(day) AS cohort_day FROM ev GROUP BY user_id)
        |SELECT cohort_day, day - cohort_day AS day_offset,
        |       count(DISTINCT ev.user_id) AS active_users
        |FROM ev JOIN cohorts ON ev.user_id = cohorts.user_id
        |GROUP BY cohort_day, day_offset
        |ORDER BY cohort_day, day_offset""".stripMargin
  )
}
