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

  /** Deterministic per-group mode: most frequent p_brand per p_type, ties
    * broken toward the smaller brand string. Spark's builtin `mode()` (and
    * DuckDB's) break ties arbitrarily — useless under an exact oracle and
    * under a deterministic-rerun contract — so the mode is derived as
    * count + total-order ranking, which also scales as two hash aggs +
    * one in-partition window instead of a per-group value buffer.
    */
  def modePerGroup(s: SparkSession, d: String): DataFrame = {
    val counts = Tables.part(s, d)
      .groupBy(col("p_type"), col("p_brand"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("p_type"))
      .orderBy(col("n").desc, col("p_brand"))
    counts
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("p_type"), col("p_brand").as("mode_brand"), col("n"))
      .orderBy("p_type")
  }

  /** Fixed-width histogram of order totals: value → bin in one projection,
    * then a hash agg — the O(n) histogram (no sort, bin count bounded by
    * range/width, map-side partials collapse each task to ≤ #bins rows).
    */
  def histogram(s: SparkSession, d: String, width: Double = 25000.0): DataFrame =
    Tables.orders(s, d)
      .select(floor(col("o_totalprice") / width).cast("long").as("bin"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_orders"))
      .withColumn("lo", col("bin") * width)
      .select("bin", "lo", "n_orders")
      .orderBy("bin")

  /** Zipf rank-frequency curve of the corpus vocabulary: global word
    * counts ranked by (count DESC, word) — the distribution check every
    * corpus-health pipeline runs. Two shuffles (word agg + rank exchange);
    * vocabulary-sized, not corpus-sized, after the first agg.
    */
  def zipf(s: SparkSession, d: String, k: Int = 30): DataFrame = {
    val counts = Tables.documents(s, d)
      .select(explode(graft.operators.WordCount.tokens(col("text"))).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("n"))
    counts
      .withColumn("rank",
        row_number().over(Window.orderBy(col("n").desc, col("word"))))
      .filter(col("rank") <= k)
      .select("rank", "word", "n")
      .orderBy("rank")
  }

  /** EWMA (α = 0.1) over each user's event values, truncated to the last
    * 20 events: the recency-weighted smoother time-series monitoring
    * runs. Computed as a SERIAL left fold `acc*(1-α) + α*x` over the
    * windowed value list — both engines fold left over identically
    * ordered lists, so the doubles are bit-identical WITHOUT rounding
    * (same IEEE ops in the same order), sidestepping the
    * order-dependent-aggregate problem entirely. The 20-event truncation
    * bounds per-row work and matches the (1-α)^k ≈ 0.12 decay horizon.
    */
  def ewma(s: SparkSession, d: String, alpha: Double = 0.1): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(-19, Window.currentRow)
    Tables.events(s, d)
      .withColumn("xs", collect_list(col("value")).over(w))
      .select(col("event_id"), col("user_id"),
        aggregate(col("xs"), lit(0.0),
          (acc, x) => acc * lit(1 - alpha) + lit(alpha) * x).as("ewma"))
      .orderBy("event_id")
  }

  /** 3σ outlier detection per group: events whose value deviates more
    * than 3 sample-stddevs from their type's mean (the events table is
    * the one driver table with genuine heavy tails — the TPC-H money
    * columns are bounded-uniform and never exceed ~1.8σ). The stats side
    * is groups-sized → broadcast back over one fact pass; at 100 TB this
    * is two scans (stats, then flag), never a sort.
    */
  def outliers(s: SparkSession, d: String): DataFrame = {
    // mu/sigma are order-dependent double aggregates — round them BEFORE
    // the threshold compare (the q_tpch_q15 discipline) so both engines
    // gate membership on identical doubles, not last-ulp-divergent ones
    val stats = Tables.events(s, d)
      .groupBy(col("event_type").as("et"))
      .agg(round(avg(col("value")), 2).as("mu"),
        round(stddev_samp(col("value")), 2).as("sigma"))
    Tables.events(s, d)
      .join(broadcast(stats), col("event_type") === col("et"))
      .filter(abs(col("value") - col("mu")) > lit(3.0) * col("sigma"))
      .select(col("event_id"), col("event_type"), col("value"),
        col("mu"), col("sigma"))
      .orderBy("event_id")
  }

  /** Equi-depth (decile) histogram of order totals: exact ntile bucket
    * boundaries over a total order (value, key tie-break) → per-bucket
    * count/min/max. The complement of q_histogram's fixed-width bins.
    * r12: the per-row ntile no longer rides an unpartitioned window (a
    * single-partition global sort at 100 TB) — TwoPass.globalNtile
    * reproduces the identical bucket ids from a range-partitioned rank,
    * so the result stays EXACT (the r11-era comment offered approx-
    * quantile boundaries as the scale substitution; the two-pass keeps
    * exactness instead). DuckDB ntile returns BIGINT, hence LongType.
    */
  def histogramEquidepth(s: SparkSession, d: String, buckets: Int = 10): DataFrame = {
    val o = Tables.orders(s, d).select(col("o_totalprice"), col("o_orderkey"))
    val keys = Seq(col("o_totalprice"), col("o_orderkey"))
    // hybrid gate: classic window under the footer-stats row bound (2×
    // cheaper at fixture scale), exact two-pass past it — see
    // TwoPass.smallInput for the rationale and evidence
    val tiled =
      if (TwoPass.smallInput(s, Tables.rowCount(s, d, "orders")))
        o.select(col("o_totalprice"),
          ntile(buckets).over(Window.orderBy(keys: _*)).cast("long").as("decile"))
      else TwoPass.globalNtile(o, buckets, keys, "decile")
    tiled
      .groupBy("decile")
      .agg(count(lit(1)).as("n_orders"),
        min(col("o_totalprice")).as("lo"), max(col("o_totalprice")).as("hi"))
      .orderBy("decile")
  }

  /** Two-sample Kolmogorov-Smirnov test: are click values and view
    * values drawn from the same distribution? D = max |F_a - F_b| over
    * the shared value grid, compared to the 95% critical value
    * 1.358*sqrt((na+nb)/(na*nb)). One linear scan folds both samples
    * into per-distinct-value counts; the ordered cumulative window runs
    * over the VALUE SPINE, which is bounded by the 2-decimal value grid
    * (<= 49k rows regardless of corpus size) — the bounded-domain
    * exception to the no-global-window rule, stated explicitly. Every
    * quantity is exact-integer-derived (counts, cent values); the only
    * doubles are exact divisions, one IEEE sqrt (correctly rounded by
    * spec), and comparisons of identically-computed values — so D, the
    * critical value, and the reject flag are bit-identical across
    * engines. */
  def ksTest(s: SparkSession, d: String): DataFrame = {
    val wCum = Window.orderBy("v_c")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy()
    val cum = Tables.events(s, d)
      .filter(col("event_type").isin("click", "view"))
      .select(round(col("value") * 100).cast("long").as("v_c"),
        (col("event_type") === "click").cast("long").as("is_a"))
      .groupBy("v_c")
      .agg(sum(col("is_a")).as("ai"), (count(lit(1)) - sum(col("is_a"))).as("bi"))
      .withColumn("na", sum(col("ai")).over(wAll))
      .withColumn("nb", sum(col("bi")).over(wAll))
      .withColumn("diff",
        abs(sum(col("ai")).over(wCum).cast("double") / col("na").cast("double") -
          sum(col("bi")).over(wCum).cast("double") / col("nb").cast("double")))
    cum.withColumn("d_stat", max(col("diff")).over(wAll))
      .groupBy("na", "nb", "d_stat")
      .agg(min(when(col("diff") === col("d_stat"), col("v_c")))
        .as("d_at_cents"))
      .withColumn("ks_crit",
        lit(1.358) * sqrt((col("na") + col("nb")).cast("double") /
          (col("na") * col("nb")).cast("double")))
      .withColumn("reject", col("d_stat") > col("ks_crit"))
      .select("na", "nb", "d_stat", "d_at_cents", "ks_crit", "reject")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ks_test" -> (ksTest(_, _)),
    "q_histogram_equidepth" -> (histogramEquidepth(_, _)),
    "q_ewma" -> (ewma(_, _)),
    "q_outliers" -> (outliers(_, _)),
    "q_regression" -> (regression(_, _)),
    "q_edit_distance" -> (editDistance(_, _)),
    "q_rolling_1h" -> (rollingHour(_, _)),
    "q_mode_pergroup" -> (modePerGroup(_, _)),
    "q_histogram" -> (histogram(_, _)),
    "text_zipf" -> (zipf(_, _))
  )

  val oracles: Map[String, String] = Map(
    "q_ks_test" ->
      """WITH g AS (
        |  SELECT CAST(round(value * 100) AS BIGINT) AS v_c,
        |         CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |              AS BIGINT) AS ai,
        |         CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
        |              AS BIGINT) AS bi
        |  FROM events WHERE event_type IN ('click', 'view')
        |  GROUP BY 1),
        |c AS (
        |  SELECT v_c,
        |         CAST(sum(ai) OVER () AS BIGINT) AS na,
        |         CAST(sum(bi) OVER () AS BIGINT) AS nb,
        |         abs(CAST(sum(ai) OVER (ORDER BY v_c
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |               AS DOUBLE) / CAST(sum(ai) OVER () AS DOUBLE)
        |             - CAST(sum(bi) OVER (ORDER BY v_c
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |               AS DOUBLE) / CAST(sum(bi) OVER () AS DOUBLE)) AS diff
        |  FROM g),
        |m AS (
        |  SELECT v_c, na, nb, diff, max(diff) OVER () AS d_stat FROM c)
        |SELECT na, nb, d_stat,
        |       min(CASE WHEN diff = d_stat THEN v_c END) AS d_at_cents,
        |       1.358 * sqrt(CAST(na + nb AS DOUBLE)
        |                    / CAST(na * nb AS DOUBLE)) AS ks_crit,
        |       max(diff) > 1.358 * sqrt(CAST(na + nb AS DOUBLE)
        |                    / CAST(na * nb AS DOUBLE)) AS reject
        |FROM m GROUP BY na, nb, d_stat""".stripMargin,
    "q_histogram_equidepth" ->
      """SELECT decile, count(*) AS n_orders,
        |       min(o_totalprice) AS lo, max(o_totalprice) AS hi
        |FROM (SELECT o_totalprice,
        |             ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile
        |      FROM orders)
        |GROUP BY decile ORDER BY decile""".stripMargin,
    // list(value) OVER the same frame yields the identically ordered list;
    // list_reduce folds left exactly like Spark's aggregate() — raw
    // doubles compare bit-exact, no rounding needed
    // window ordered by epoch_us (not raw ns ts): Spark sees µs-truncated
    // timestamps, so a sub-µs tie must reach the event_id tie-break in
    // BOTH engines or the fold order (and the unrounded doubles) diverge
    "q_ewma" ->
      """SELECT event_id, user_id,
        |       list_reduce(list_prepend(0.0::DOUBLE, xs),
        |                   (acc, x) -> acc * 0.9 + 0.1 * x) AS ewma
        |FROM (SELECT event_id, user_id,
        |             list(value) OVER (PARTITION BY user_id
        |                               ORDER BY epoch_us(CAST(ts AS TIMESTAMP)),
        |                                        event_id
        |                               ROWS BETWEEN 19 PRECEDING
        |                               AND CURRENT ROW) AS xs
        |      FROM events)
        |ORDER BY event_id""".stripMargin,
    "q_outliers" ->
      """WITH stats AS (
        |  SELECT event_type AS et, round(avg(value), 2) AS mu,
        |         round(stddev_samp(value), 2) AS sigma
        |  FROM events GROUP BY event_type)
        |SELECT event_id, event_type, value, mu, sigma
        |FROM events JOIN stats ON event_type = et
        |WHERE abs(value - mu) > 3.0 * sigma
        |ORDER BY event_id""".stripMargin,
    "q_regression" ->
      """SELECT l_returnflag,
        |       round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
        |       round(regr_intercept(l_extendedprice, l_quantity), 4) AS icept,
        |       round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
        |       CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n
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
        |ORDER BY event_id""".stripMargin,
    "q_mode_pergroup" ->
      """SELECT p_type, p_brand AS mode_brand, n
        |FROM (SELECT p_type, p_brand, count(*) AS n,
        |             row_number() OVER (PARTITION BY p_type
        |                                ORDER BY count(*) DESC, p_brand) AS rk
        |      FROM part GROUP BY p_type, p_brand)
        |WHERE rk = 1 ORDER BY p_type""".stripMargin,
    "q_histogram" ->
      """SELECT CAST(floor(o_totalprice / 25000.0) AS BIGINT) AS bin,
        |       CAST(floor(o_totalprice / 25000.0) AS BIGINT) * 25000.0::DOUBLE AS lo,
        |       count(*) AS n_orders
        |FROM orders
        |GROUP BY 1, 2 ORDER BY bin""".stripMargin,
    "text_zipf" ->
      """SELECT CAST(row_number() OVER (ORDER BY n DESC, word) AS INT) AS rank, word, n
        |FROM (SELECT word, count(*) AS n
        |      FROM (SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS word
        |            FROM documents)
        |      WHERE word <> '' GROUP BY word)
        |ORDER BY n DESC, word LIMIT 30""".stripMargin
  )
}
