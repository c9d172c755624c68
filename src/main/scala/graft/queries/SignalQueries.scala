package graft.queries

import graft.Tables
import graft.plans.Fnv1a64
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 signal batch — four more concept-grepped-new surfaces:
  *
  *  - `priv_rr_estimate`   — local differential privacy via randomized
  *                           response with exact debiasing (the mechanism
  *                           family `q_k_anonymity` does not touch).
  *  - `seq_regex_paths`    — MATCH_RECOGNIZE-style path analysis: each
  *                           user's ordered event history rendered as a
  *                           symbol string, patterns counted by regex.
  *  - `q_holt_trend`       — Holt double-exponential smoothing (level +
  *                           trend), a genuinely RECURSIVE time-series
  *                           state that no window sum expresses; runs on
  *                           the ordered sequential-fold device proven
  *                           bit-exact by q_kaplan_meier.
  *  - `q_weighted_median`  — exact weighted median selection by RANGE
  *                           cumulative weight (all-integer comparisons).
  *
  * Determinism: randomized response uses the FNV coin (salted per-row
  * hash), so the "noise" is reproducible across engines and cluster
  * layouts; Holt's fold multiplies doubles in day order on both engines;
  * the weighted median never leaves integer arithmetic.
  */
object SignalQueries {

  /** Local-DP randomized response over "is this event a purchase?": each
    * row reports its true bit with probability 3/4 and the flipped bit
    * with probability 1/4 (privacy eps = ln 3), the coin being the
    * deterministic FNV hash of the event id — reproducible noise, the
    * same property the salted split/sample family relies on. The
    * per-cohort estimate debiases exactly: E[reported] = n/4 + p*n/2, so
    * est = 2*reported - n/2 (exact double arithmetic on exact counts).
    * `true_yes`/`abs_err` are audit columns for the fixture — a real
    * release would emit only the estimate. Scale: one linear scan into a
    * 10-row aggregate; the mechanism is embarrassingly parallel. */
  def privRrEstimate(s: SparkSession, d: String): DataFrame = {
    val flip = Fnv1a64.ihash31(concat(col("event_id").cast("string"),
      lit("|rr"))) % 4 === 0
    val truth = col("event_type") === "purchase"
    Tables.events(s, d)
      .select((col("user_id") % 10).as("cohort"),
        truth.cast("long").as("t"),
        when(flip, when(truth, 0L).otherwise(1L))
          .otherwise(when(truth, 1L).otherwise(0L)).as("rep"))
      .groupBy("cohort")
      .agg(count(lit(1)).as("n"), sum(col("rep")).as("reported_yes"),
        sum(col("t")).as("true_yes"))
      .withColumn("est_yes",
        lit(2.0) * col("reported_yes").cast("double") -
          col("n").cast("double") / lit(2.0))
      .withColumn("abs_err",
        abs(col("est_yes") - col("true_yes").cast("double")))
      .select("cohort", "n", "reported_yes", "est_yes", "true_yes", "abs_err")
      .orderBy("cohort")
  }

  /** Sequence-pattern analysis without MATCH_RECOGNIZE (which Spark
    * lacks): each user's event history becomes an ordered initial-letter
    * string ('c'lick/'e'rror/'p'urchase/'s'ignup/'v'iew) and regexes do
    * the path work — conversions as non-overlapping 'vc*p' matches, plus
    * the longest uninterrupted view run. Both engines count
    * non-overlapping left-to-right greedy matches, and the pattern stays
    * in the POSIX-common subset so Java and RE2 semantics agree. Scale:
    * the collected path is bounded by a user's OWN history (~tens of
    * events), never the corpus; one user-keyed shuffle. */
  def seqRegexPaths(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), substring(col("event_type"), 1, 1).as("ini"))
      .groupBy("user_id")
      .agg(array_join(transform(
        sort_array(collect_list(struct(col("us"), col("event_id"),
          col("ini")))), e => e("ini")), "").as("path"))
      .select(col("user_id"),
        length(col("path")).cast("long").as("path_len"),
        regexp_count(col("path"), lit("vc*p")).cast("long").as("n_conv"),
        coalesce(array_max(transform(
          regexp_extract_all(col("path"), lit("v+"), lit(0)),
          m => length(m))), lit(0)).cast("long").as("max_view_run"))
      .orderBy("user_id")

  /** Holt double-exponential smoothing (alpha=0.3, beta=0.2) over each
    * event type's daily-count series — level-plus-trend state that is
    * genuinely recursive (each step feeds the next), which no
    * window-sum rewrite expresses. The series is collected in day order
    * (bounded by the calendar, not the corpus) and folded sequentially
    * with an [level, trend, n] accumulator; the identical formula text
    * and fold order run on both engines, so every multiply/add is the
    * same ordered IEEE op — bit-identical without transcendentals.
    * Init follows the standard convention: level = first observation,
    * trend = 0. Scale: per-series state is three doubles; series
    * count = |event types|. */
  /** The Holt fold over an ordered array<double> series, returning the
    * [level, trend, n] accumulator — shared with SignalOpsSpec's toy-
    * recurrence test so the TESTED lambda is the SHIPPED lambda (a
    * coefficient typo here fails the spec, not just the external
    * oracle). */
  private[graft] def holtFoldState(xs: Column): Column = {
    val a1 = (acc: Column) => element_at(acc, 1)
    val a2 = (acc: Column) => element_at(acc, 2)
    val a3 = (acc: Column) => element_at(acc, 3)
    aggregate(xs, array(lit(0.0), lit(0.0), lit(0.0)),
      (acc, x) => when(a3(acc) === 0.0,
        array(x, lit(0.0), lit(1.0)))
        .otherwise(array(
          lit(0.3) * x + lit(0.7) * (a1(acc) + a2(acc)),
          lit(0.2) * ((lit(0.3) * x + lit(0.7) * (a1(acc) + a2(acc)))
            - a1(acc)) + lit(0.8) * a2(acc),
          a3(acc) + lit(1.0))))
  }

  def holtTrend(s: SparkSession, d: String): DataFrame = {
    Tables.events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_days"),
        transform(sort_array(collect_list(struct(col("day"), col("cnt")))),
          e => e("cnt").cast("double")).as("xs"))
      .withColumn("st", holtFoldState(col("xs")))
      .select(col("event_type"), col("n_days"),
        element_at(col("st"), 1).as("level"),
        element_at(col("st"), 2).as("trend"),
        (element_at(col("st"), 1) + element_at(col("st"), 2)).as("forecast"))
      .orderBy("event_type")
  }

  /** Exact weighted median: smallest price (in cents) whose cumulative
    * quantity reaches half the group's total quantity — selected WITHOUT
    * a per-group global sort. A first draft used a RANGE cumulative
    * window partitioned by l_returnflag, but 3 distinct keys means 3
    * tasks sort the entire table (measured 4.0x on 10x data at sf1 —
    * exactly the 100 TB bottleneck), so this is the `q_median_2pass`
    * discipline instead, weight-generalized: pass 1 folds one scan into
    * a per-(group, 16384-cent-bucket) weighted histogram whose size is a
    * PARAMETER (groups x price-range/width, ~2k rows), the driver
    * prefix-sums it to the bucket where cumulative weight crosses half,
    * and pass 2 re-scans ONLY those (group, bucket) slices — ~1/600 of
    * the data; the group equality pushes to the scan, the bucket
    * predicate is a computed column evaluated right above it —
    * aggregating per exact cent value
    * (<= 16384 distinct per group, again parameter-bounded) to select
    * the crossing value. Ties are well-defined because weight
    * accumulates per VALUE, and everything is integer arithmetic.
    * Distinct from `q_percentiles`/`q_median_2pass`, which are
    * unweighted. */
  def weightedMedian(s: SparkSession, d: String): DataFrame = {
    val bucketW = 16384L
    val base = Tables.lineitem(s, d)
      .select(col("l_returnflag").as("rf"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"),
        round(col("l_quantity")).cast("long").as("q"))
    val hist = base
      .groupBy(col("rf"), expr(s"cents div $bucketW").as("b"))
      .agg(sum(col("q")).as("wq"))
      .collect().map(r => (r.getAs[String]("rf"), r.getAs[Long]("b")) ->
        r.getAs[Long]("wq")).toMap
    import s.implicits._
    if (hist.isEmpty)
      return Seq.empty[(String, Long, Long)]
        .toDF("l_returnflag", "tot_w", "wmedian_cents")
    // driver-side prefix sums over the parameter-sized histogram: locate
    // each group's crossing bucket and the weight accumulated before it
    val picks: Map[String, (Long, Long, Long)] =
      hist.keys.map(_._1).toSeq.distinct.map { rf =>
        val byB = hist.collect { case ((`rf`, b), w) => b -> w }.toSeq.sortBy(_._1)
        val tot = byB.map(_._2).sum
        val cums = byB.map(_._2).scanLeft(0L)(_ + _).tail
        val i = cums.indexWhere(2 * _ >= tot)
        rf -> ((byB(i)._1, cums(i) - byB(i)._2, tot))
      }.toMap
    val sliceCond = picks.map { case (rf, (b, _, _)) =>
      col("rf") === rf && expr(s"cents div $bucketW") === b
    }.reduce(_ || _)
    val slices = base.filter(sliceCond)
      .groupBy("rf", "cents").agg(sum(col("q")).as("wq"))
      .collect()
      .groupBy(_.getAs[String]("rf"))
    val rows = picks.toSeq.map { case (rf, (_, wBefore, tot)) =>
      val byCents = slices(rf)
        .map(r => (r.getAs[Long]("cents"), r.getAs[Long]("wq")))
        .sortBy(_._1)
      val cums = byCents.map(_._2).scanLeft(wBefore)(_ + _).tail
      val med = byCents(cums.indexWhere(2 * _ >= tot))._1
      (rf, tot, med)
    }.sortBy(_._1)
    rows.toDF("l_returnflag", "tot_w", "wmedian_cents")
  }

  /** Theil-Sen robust regression over the 24-point hourly-mean spine —
    * the median-of-pairwise-slopes estimator (breakdown point 29%, where
    * `q_regression`'s OLS breaks at one outlier). The spine is bounded by
    * the hour universe, so the all-pairs slope set is C(24,2) = 276
    * values computed driver-side (the isotonic/shapley bounded-collect
    * precedent); the corpus-scan half is the distributed hourly
    * aggregate. Exactness: y rides micro-dollar BIGINTs; slopes are
    * doubles from exact integers; both medians use the same
    * avg-of-middle-ranks form on both engines (odd count degenerates to
    * the single middle). Intercept = median residual at the fitted
    * slope.
    */
  def theilSen(s: SparkSession, d: String): DataFrame = {
    val spine = Tables.events(s, d)
      .select(hour(col("ts")).as("hr"),
        round(col("value") * 100).cast("long").as("v_c"))
      .groupBy("hr").agg(count(lit(1)).as("n"), sum(col("v_c")).as("sum_c"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val pts = spine.map { case (hr, n, sumC) =>
      (hr.toLong, math.round(sumC.toDouble / n * 10000.0))
    }
    // a spine with < 2 points has no pairwise slope — fail deliberately
    // instead of an IndexOutOfBounds inside med() (the oracle would emit
    // a NULL row; neither output is meaningful)
    require(pts.length >= 2,
      s"theil-sen needs >= 2 distinct hours, got ${pts.length}")
    def med(xs: Seq[Double]): Double =
      if (xs.length % 2 == 1) xs(xs.length / 2)
      else (xs(xs.length / 2 - 1) + xs(xs.length / 2)) / 2.0
    val slopes = (for {
      i <- pts.indices; j <- pts.indices if i < j
    } yield (pts(j)._2 - pts(i)._2).toDouble / (pts(j)._1 - pts(i)._1))
      .sorted.toSeq
    val slope = med(slopes)
    val icept = med(pts.map { case (x, y) => y - slope * x }.sorted.toSeq)
    import s.implicits._
    Seq((pts.length.toLong, slopes.length.toLong, slope, icept))
      .toDF("n_points", "n_pairs", "s_micro", "i_micro")
      .select(col("n_points"), col("n_pairs"),
        round(col("s_micro") / 1000000.0, 6).as("slope"),
        round(col("i_micro") / 1000000.0, 6).as("icept"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_theil_sen" -> (theilSen(_, _)),
    "priv_rr_estimate" -> (privRrEstimate(_, _)),
    "seq_regex_paths" -> (seqRegexPaths(_, _)),
    "q_holt_trend" -> (holtTrend(_, _)),
    "q_weighted_median" -> (weightedMedian(_, _))
  )

  val oracles: Map[String, String] = Map(
    "q_theil_sen" ->
      """WITH ev AS (SELECT CAST(hour(CAST(ts AS TIMESTAMP)) AS INT) AS hr,
        |                   CAST(round(value * 100) AS BIGINT) AS v_c
        |            FROM events),
        |h AS (SELECT hr, CAST(count(*) AS BIGINT) AS n,
        |             CAST(sum(v_c) AS BIGINT) AS sum_c FROM ev GROUP BY hr),
        |pts AS (SELECT CAST(hr AS BIGINT) AS x,
        |               CAST(round(sum_c / CAST(n AS DOUBLE) * 10000.0)
        |                    AS BIGINT) AS y
        |        FROM h),
        |sl AS (SELECT (b.y - a.y) / CAST(b.x - a.x AS DOUBLE) AS s
        |       FROM pts a JOIN pts b ON a.x < b.x),
        |sr AS (SELECT s, row_number() OVER (ORDER BY s) AS rk,
        |              count(*) OVER () AS cnt FROM sl),
        |slope AS (SELECT avg(s) AS sm FROM sr
        |          WHERE rk IN ((cnt + 1) // 2, (cnt + 2) // 2)),
        |r0 AS (SELECT y - (SELECT sm FROM slope) * x AS r FROM pts),
        |rr AS (SELECT r, row_number() OVER (ORDER BY r) AS rk,
        |              count(*) OVER () AS cnt FROM r0),
        |icept AS (SELECT avg(r) AS im FROM rr
        |          WHERE rk IN ((cnt + 1) // 2, (cnt + 2) // 2))
        |SELECT (SELECT CAST(count(*) AS BIGINT) FROM pts) AS n_points,
        |       (SELECT CAST(count(*) AS BIGINT) FROM sl) AS n_pairs,
        |       round((SELECT sm FROM slope) / 1000000.0, 6) AS slope,
        |       round((SELECT im FROM icept) / 1000000.0, 6) AS icept""".stripMargin,
    "priv_rr_estimate" -> {
      val h = OracleSql.fnvIhash31("CAST(event_id AS VARCHAR) || '|rr'")
      s"""WITH b AS (
         |  SELECT user_id % 10 AS cohort,
         |         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS t,
         |         CASE WHEN $h % 4 = 0
         |              THEN CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END
         |              ELSE CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
         |         END AS rep
         |  FROM events),
         |g AS (
         |  SELECT cohort, CAST(count(*) AS BIGINT) AS n,
         |         CAST(sum(rep) AS BIGINT) AS reported_yes,
         |         CAST(sum(t) AS BIGINT) AS true_yes
         |  FROM b GROUP BY cohort)
         |SELECT cohort, n, reported_yes,
         |       2.0 * CAST(reported_yes AS DOUBLE)
         |         - CAST(n AS DOUBLE) / 2.0 AS est_yes,
         |       true_yes,
         |       abs((2.0 * CAST(reported_yes AS DOUBLE)
         |            - CAST(n AS DOUBLE) / 2.0)
         |           - CAST(true_yes AS DOUBLE)) AS abs_err
         |FROM g ORDER BY cohort""".stripMargin
    },
    "seq_regex_paths" ->
      """WITH p AS (
        |  SELECT user_id,
        |         string_agg(substr(event_type, 1, 1), ''
        |           ORDER BY ts, event_id) AS path
        |  FROM events GROUP BY user_id)
        |SELECT user_id,
        |       CAST(length(path) AS BIGINT) AS path_len,
        |       CAST(len(regexp_extract_all(path, 'vc*p')) AS BIGINT)
        |         AS n_conv,
        |       CAST(coalesce(list_max(list_transform(
        |              regexp_extract_all(path, 'v+'), m -> length(m))), 0)
        |            AS BIGINT) AS max_view_run
        |FROM p ORDER BY user_id""".stripMargin,
    "q_holt_trend" ->
      """WITH g AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |         CAST(count(*) AS DOUBLE) AS cnt
        |  FROM events GROUP BY 1, 2),
        |l AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
        |         list_transform(list(cnt ORDER BY day), v -> [v]) AS xs
        |  FROM g GROUP BY event_type),
        |f AS (
        |  SELECT event_type, n_days,
        |         list_reduce(
        |           list_prepend(CAST([0.0, 0.0, 0.0] AS DOUBLE[]), xs),
        |           (acc, x) -> CASE WHEN acc[3] = 0.0
        |             THEN [x[1], 0.0, 1.0]
        |             ELSE [0.3 * x[1] + 0.7 * (acc[1] + acc[2]),
        |                   0.2 * ((0.3 * x[1] + 0.7 * (acc[1] + acc[2]))
        |                          - acc[1]) + 0.8 * acc[2],
        |                   acc[3] + 1.0]
        |           END) AS st
        |  FROM l)
        |SELECT event_type, n_days, st[1] AS level, st[2] AS trend,
        |       st[1] + st[2] AS forecast
        |FROM f ORDER BY event_type""".stripMargin,
    "q_weighted_median" ->
      """WITH b AS (
        |  SELECT l_returnflag,
        |         CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
        |         CAST(round(l_quantity) AS BIGINT) AS q
        |  FROM lineitem),
        |w AS (
        |  SELECT l_returnflag, cents,
        |         CAST(sum(q) OVER (PARTITION BY l_returnflag ORDER BY cents
        |           RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |           AS BIGINT) AS cumw,
        |         CAST(sum(q) OVER (PARTITION BY l_returnflag) AS BIGINT)
        |           AS totw
        |  FROM b)
        |SELECT l_returnflag, max(totw) AS tot_w,
        |       min(cents) AS wmedian_cents
        |FROM w WHERE cumw * 2 >= totw
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
  )
}
