package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Advanced operator coverage: as-of join, skew-salted aggregation, exact
  * percentiles, approximate distinct sketches, typed Dataset surface,
  * SQL-text entry point, cross join, union-by-name.
  */
object AdvancedQueries {

  /** As-of join (SURVEY.md §2.C joins row): for every purchase event, the
    * most recent prior click by the same user. Implemented the scalable way
    * — union both streams, one window pass with last_value(ignoreNulls) —
    * instead of a per-row range join: one shuffle on user_id, no quadratic
    * candidate set, works at any skew.
    */
  def asofJoin(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
      .withColumn("click_ts",
        last(when(col("event_type") === "click", col("ts")), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        col("ts").cast("long").as("purchase_ts"),
        col("click_ts").cast("long").as("asof_click_ts"))
      .orderBy("event_id")
  }

  /** FORWARD as-of: each purchase paired with the NEXT click at-or-after
    * it by the same user — the direction the window form flips for free
    * (first_value over the mirrored frame), completing the as-of family
    * (backward / backward+tolerance / forward). Same single user_id
    * shuffle, no quadratic candidate set.
    */
  def asofForward(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    ev.select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
      .withColumn("click_ts",
        first(when(col("event_type") === "click", col("ts")), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        col("ts").cast("long").as("purchase_ts"),
        col("click_ts").cast("long").as("next_click_ts"))
      .orderBy("event_id")
  }

  /** The SAME as-of semantics through the NATIVE operator
    * (graft.plans.AsOfJoin — custom LogicalPlan + SparkStrategy +
    * SparkPlan): purchases probe, clicks broadcast-build. Zero shuffle and
    * zero sort of the probe side, vs one full shuffle+sort for the window
    * form above — the shape you want when the build side (clicks per
    * dimension horizon) broadcasts but the probe side is the 100 TB fact.
    * Oracle: DuckDB's own native ASOF LEFT JOIN.
    */
  def asofNative(s: SparkSession, d: String): DataFrame = asofEvents(s, d)

  /** Native point-in-interval join (plans/IntervalJoin — custom
    * LogicalPlan+Strategy+SparkPlan, like the as-of family): overlapping
    * price bands (width 16000, stride 8000 ⇒ interior prices match
    * exactly two bands) over the lineitem fact. OSS Spark would plan the
    * BETWEEN join as BroadcastNestedLoopJoin — O(probe × bands) with the
    * whole band table scanned per row; the custom exec binary-searches
    * the lo-sorted broadcast band list with a prefix-max-hi early stop,
    * O(log m + matches) per probe row, probe never shuffled or sorted.
    * Measured at sf0.1: ~even with BNLJ at 14 bands (codegen'd BNLJ wins
    * on constants when m is tiny), 6× faster at 1400 bands (0.6 s vs
    * 3.6 s) and diverging linearly in m beyond — the regime that matters
    * (IP ranges, calendars, tariff tables are 10³-10⁶ intervals).
    * Oracle: plain BETWEEN join (DuckDB), identical result set.
    */
  def intervalNative(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_extendedprice"))
    val bands = s.range(14).select(col("id").as("band_id"),
      (col("id").cast("double") * 8000).as("lo"),
      (col("id").cast("double") * 8000 + 15999.99).as("hi"))
    graft.plans.IntervalJoin.intervalJoin(li, bands,
        li("l_extendedprice"), bands("lo"), bands("hi"))
      .groupBy("band_id")
      // cent-exact long sum: round(sum(double), 2) is order-dependent and
      // flipped the last cent at sf1 (~450k-row band sums) — prices are
      // cent-valued, so per-row cents are exact and their long sum is
      // partition-order-free (the q_decimal_money discipline)
      .agg(count(lit(1)).as("n_items"),
        sum(round(col("l_extendedprice") * lit(100)).cast("long"))
          .as("sum_price_cents"))
      .orderBy("band_id")
  }

  /** Bucketed (shuffle-both-sides) interval join — the BIG-build-side
    * path of the interval family, composed from existing operators:
    * intervals replicate to the fixed-width buckets they overlap, the
    * fact equi-joins on the bucket id, containment re-checked exactly.
    * Same answer as `q_interval_native` by construction (one shared
    * oracle shape); the two registry entries document the stats-driven
    * choice: broadcast exec for band-table-sized builds, bucketed
    * shuffle when the interval set itself is fact-sized.
    */
  def intervalBucketed(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_extendedprice"))
    val bands = s.range(14).select(col("id").as("band_id"),
      (col("id").cast("double") * 8000).as("lo"),
      (col("id").cast("double") * 8000 + 15999.99).as("hi"))
    graft.plans.IntervalJoin.intervalJoinBucketed(li, bands,
        li("l_extendedprice"), bands("lo"), bands("hi"), width = 8000.0)
      .groupBy("band_id")
      // cent-exact long sum: round(sum(double), 2) is order-dependent and
      // flipped the last cent at sf1 (~450k-row band sums) — prices are
      // cent-valued, so per-row cents are exact and their long sum is
      // partition-order-free (the q_decimal_money discipline)
      .agg(count(lit(1)).as("n_items"),
        sum(round(col("l_extendedprice") * lit(100)).cast("long"))
          .as("sum_price_cents"))
      .orderBy("band_id")
  }

  /** Bounded-lookback as-of: same as `asofNative` but a click older than
    * 1 hour no longer matches (pandas merge_asof `tolerance` semantics).
    * Oracle: plain SQL (left join bounded both ways + max per purchase).
    */
  def asofTolerance(s: SparkSession, d: String): DataFrame =
    asofEvents(s, d, toleranceMicros = 3600L * 1000000L)

  /** Shared purchase←click as-of shape (the two registry entries differ
    * only in the lookback bound). */
  private def asofEvents(s: SparkSession, d: String,
      toleranceMicros: Long = -1L): DataFrame = {
    val ev = Tables.events(s, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
    graft.plans.AsOfJoin.asof(purchases, clicks,
        leftKeys = Seq(purchases("user_id")), rightKeys = Seq(clicks("c_user")),
        leftTime = purchases("ts"), rightTime = clicks("c_ts"),
        toleranceMicros = toleranceMicros)
      .select(col("event_id"), col("user_id"),
        col("ts").cast("long").as("purchase_ts"),
        col("c_ts").cast("long").as("asof_click_ts"))
      .orderBy("event_id")
  }

  /** Skew-salted aggregation: two-stage groupBy over (key, salt) then key —
    * identical results to a direct groupBy (same oracle), but the first
    * shuffle spreads a hot key over 16 reducers. The pattern for power-law
    * keys at 100 TB; AQE's skew handling covers joins, this covers
    * aggregations with huge per-key value streams.
    */
  def saltedAgg(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .withColumn("salt", pmod(col("l_orderkey") + col("l_linenumber"), lit(16)))
      .groupBy(col("l_returnflag"), col("salt"))
      .agg(count(lit(1)).as("c"), sum("l_quantity").as("q"))
      .groupBy("l_returnflag")
      .agg(sum("c").as("cnt"), round(sum("q"), 2).as("sum_qty"))
      .orderBy("l_returnflag")

  /** Exact percentiles (median & p90) per group — Spark `percentile` and
    * DuckDB `quantile_cont` both do linear interpolation.
    */
  def percentiles(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        round(expr("percentile(l_extendedprice, 0.5)"), 4).as("p50"),
        round(expr("percentile(l_extendedprice, 0.9)"), 4).as("p90"))
      .orderBy("l_returnflag")

  /** HLL approx_count_distinct next to the exact count — the sketch that
    * replaces exact distinct at 100 TB. HLL sketch values are
    * engine-specific, so the oracle gates the *error envelope* instead of
    * the raw estimate: the exact count is oracle-checked value-for-value,
    * and `within_tol` asserts |approx − exact| ≤ 6% (3σ at rsd = 0.02;
    * Spark's HLL++ is deterministic for fixed data, so a pass is stable,
    * not flaky). ApproxSpec additionally tracks the envelope across SFs.
    */
  def approxDistinct(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"),
        countDistinct(col("l_partkey")).as("exact_parts"))
      .select(col("l_returnflag"), col("exact_parts"),
        (abs(col("approx_parts") - col("exact_parts")) <=
          col("exact_parts") * 0.06).as("within_tol"))
      .orderBy("l_returnflag")

  /** wc through the typed Dataset surface — `Dataset[String].flatMap` is the
    * literal MapFn shape (/root/reference/src/lib.rs:122-127) with an
    * Encoder boundary; same oracle as the DataFrame wc.
    */
  def typedWordcount(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("text")).as[String]
      .flatMap(_.toLowerCase.split("[^a-z]+").filter(_.nonEmpty))
      .toDF("word")
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").asc, col("word").asc)
  }

  /** wc through the RDD surface — `rdd.flatMap.reduceByKey` is the classic
    * MapReduce decomposition (map_fn emit (word,1), combiner+reducer sum,
    * exactly /root/reference/src/app/wc.rs). Kept as the one RDD-API
    * demonstration: the DataFrame form compiles to the same shuffle with
    * codegen + Tungsten on top, which is why everything else here is
    * declarative.
    */
  def rddWordcount(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("text")).as[String].rdd
      .flatMap(_.toLowerCase.split("[^a-z]+").filter(_.nonEmpty))
      .map((_, 1L))
      .reduceByKey(_ + _)
      .toDF("word", "cnt")
      .orderBy(col("cnt").asc, col("word").asc)
  }

  /** The SQL entry point: same engine, query authored as SQL text over temp
    * views (the reference's "named app + args" dispatch, but with a real
    * parser/optimizer in front).
    */
  /** Spark 4 SQL PIPE syntax (`|>`): the same logical plan as a nested
    * standard query, written as a linear left-to-right pipeline — scan
    * |> filter |> aggregate |> sort. The oracle is the standard-SQL
    * restatement, so this gates that the pipe surface reaches the same
    * plan, not just that it parses.
    */
  def sqlPipe(s: SparkSession, d: String): DataFrame = {
    Tables.lineitem(s, d).createOrReplaceTempView("lineitem_v")
    s.sql(
      """FROM lineitem_v
        ||> WHERE l_quantity >= 30
        ||> AGGREGATE count(*) AS cnt,
        |             sum(CAST(round(l_extendedprice * 100) AS BIGINT))
        |               AS sum_price_c
        |   GROUP BY l_returnflag
        ||> ORDER BY l_returnflag""".stripMargin)
  }

  /** Parameterized SQL (named-parameter binding, Spark 3.4+): the text
    * carries `:minQty`/`:flag` placeholders and values bind at execution
    * — the injection-safe templating surface. Oracle inlines the same
    * constants.
    */
  def sqlParams(s: SparkSession, d: String): DataFrame = {
    Tables.lineitem(s, d).createOrReplaceTempView("lineitem_v")
    s.sql(
      """SELECT l_linestatus, count(*) AS cnt,
        |       sum(CAST(round(l_quantity * 100) AS BIGINT)) AS sum_qty_c
        |FROM lineitem_v
        |WHERE l_quantity >= :minQty AND l_returnflag = :flag
        |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,
      Map("minQty" -> 25, "flag" -> "R"))
  }

  /** GROUP BY ALL / ORDER BY ALL (Spark 3.4+ / DuckDB shared shorthand):
    * every non-aggregate select item becomes a grouping key implicitly —
    * the schema-drift-proof form of wide rollups. The oracle uses the
    * SAME shorthand in DuckDB, gating that both engines infer identical
    * keys.
    */
  def groupByAll(s: SparkSession, d: String): DataFrame = {
    Tables.orders(s, d).createOrReplaceTempView("orders_v")
    s.sql(
      """SELECT o_orderstatus, o_orderpriority,
        |       CAST(count(*) AS BIGINT) AS cnt,
        |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |         AS sum_price_c
        |FROM orders_v GROUP BY ALL ORDER BY ALL""".stripMargin)
  }

  /** IDENTIFIER() dynamic-name binding (Spark 3.4+): the table name
    * arrives as a named PARAMETER and resolves through IDENTIFIER — the
    * injection-safe way to template object names (plain :param cannot
    * appear in a FROM clause).
    */
  def sqlIdentifier(s: SparkSession, d: String): DataFrame = {
    Tables.customer(s, d).createOrReplaceTempView("customer_v")
    s.sql(
      """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS cnt
        |FROM IDENTIFIER(:tbl) GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
      Map("tbl" -> "customer_v"))
  }

  def sqlEntry(s: SparkSession, d: String): DataFrame = {
    Tables.orders(s, d).createOrReplaceTempView("orders_v")
    Tables.customer(s, d).createOrReplaceTempView("customer_v")
    s.sql(
      """SELECT c_mktsegment, count(*) AS n_orders,
        |       round(sum(o_totalprice), 2) AS total
        |FROM orders_v JOIN customer_v ON o_custkey = c_custkey
        |WHERE o_orderstatus = 'O'
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin)
  }

  /** Explicit cross join (dimension × dimension). */
  def crossJoinSmall(s: SparkSession, d: String): DataFrame =
    Tables.region(s, d).select(col("r_name"))
      .crossJoin(Tables.nation(s, d).select(col("n_name")))
      .orderBy("r_name", "n_name")

  /** unionByName across differently-ordered projections. */
  def unionByNameQ(s: SparkSession, d: String): DataFrame = {
    val a = Tables.supplier(s, d).select(col("s_suppkey").as("k"), col("s_name").as("name"))
    val b = Tables.customer(s, d).filter(col("c_custkey") <= 10)
      .select(col("c_name").as("name"), col("c_custkey").as("k"))
    a.unionByName(b).orderBy("k", "name")
  }

  /** Internals of the two-pass selection, exposed for the spec: returns
    * (n, the two middle-rank targets, histogram bucket id and row count
    * actually sorted in pass 2 for each target). */
  private[graft] def median2passStats(s: SparkSession, d: String):
      (Long, Seq[(Long, Int, Long, Double)]) = {
    val v = Tables.orders(s, d).select(col("o_totalprice").as("x"))
    val mm = v.agg(count(lit(1)).as("n"), min("x").as("lo"), max("x").as("hi"))
      .collect()(0)
    val (n, lo, hi) = (mm.getLong(0), mm.getDouble(1), mm.getDouble(2))
    require(n > 0, "empty input")
    if (lo == hi) return (n, Seq(((n + 1) / 2, 0, n, lo)))
    val nb = 256
    val bucket = least(floor((col("x") - lo) / ((hi - lo) / nb)), lit(nb - 1))
      .cast("int").as("b")
    // pass 1: one linear scan → a 256-row histogram (driver-side is fine:
    // it is the broadcast-sized summary, independent of data volume)
    val hist = v.select(bucket).groupBy("b").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val cumBefore = (0 until nb).scanLeft(0L)((acc, b) => acc + hist.getOrElse(b, 0L))
    val targets = Seq((n + 1) / 2, (n + 2) / 2).distinct
    val stats = targets.map { k =>
      val b = (0 until nb).find(i => cumBefore(i + 1) >= k).get
      val offset = (k - cumBefore(b)).toInt
      // pass 2: sort ONLY the target bucket's rows; the k-th order stat is
      // the max of the offset-smallest (TakeOrdered heap, no global sort)
      val xk = v.filter(bucket === b).orderBy("x").limit(offset)
        .agg(max("x")).collect()(0).getDouble(0)
      (k, b, hist(b), xk)
    }
    (n, stats)
  }

  /** Exact median WITHOUT a global sort — the two-pass selection a 100 TB
    * order statistic actually uses: pass 1 folds the corpus into a
    * 256-bucket histogram (one scan, broadcast-sized result), the driver
    * prefix-sums it to locate the bucket holding each middle rank, and
    * pass 2 sorts ONLY that bucket (~1/256 of the data; recurse at
    * extreme skew) to extract the order statistic via a TakeOrdered
    * heap. Both middle ranks are fetched so even-n interpolation is
    * exact; (a+b)/2 matches the oracle's avg over the two order
    * statistics bit-for-bit.
    */
  def median2pass(s: SparkSession, d: String): DataFrame = {
    val (n, stats) = median2passStats(s, d)
    val med = stats.map(_._4).sum / stats.length
    import s.implicits._
    Seq((n, med)).toDF("n", "median")
  }

  /** Skyline (Pareto frontier): the parts no other part beats on BOTH
    * price (lower better) and size (higher better) — the classic
    * multi-criteria operator relational algebra can only express as an
    * O(n²) dominance anti-join (the DuckDB oracle's NOT EXISTS form).
    * Spark path is the published two-phase distributed skyline: each
    * partition computes its LOCAL skyline with one sorted sweep
    * (price asc, size desc; a point survives iff it beats every
    * strictly-cheaper point's max size and heads its own price group),
    * then the union of local skylines — expected O(log n) points per
    * partition on independent dims, not O(n) — is re-swept once on a
    * single post-shrink partition. Correct because a global skyline
    * point is never dominated in ANY subset, so phase 1 cannot drop it;
    * mapPartitions is the honest tool here (SURVEY §4 path (d)): the
    * alternative is the quadratic self-join or a corpus-wide
    * single-partition window. Duplicate (price, size) points are mutual
    * non-dominators and all survive — both engines agree by the same
    * tie rule.
    */
  def skyline(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val pts = Tables.part(s, d).select(
        col("p_partkey").as("id"),
        round(col("p_retailprice") * 100).cast("long").as("price_c"),
        col("p_size").cast("long").as("size"))
      .as[(Long, Long, Long)]
    def sweep(it: Iterator[(Long, Long, Long)]): Iterator[(Long, Long, Long)] = {
      // requires (price asc, size desc) sorted input
      var maxCheaper = Long.MinValue   // max size over strictly cheaper points
      var groupPrice = Long.MinValue   // current price group
      var groupMax = Long.MinValue     // max size within the group (its head)
      it.filter { case (_, price, size) =>
        if (price != groupPrice) {
          if (groupMax > maxCheaper) maxCheaper = groupMax
          groupPrice = price; groupMax = size
        }
        size == groupMax && size > maxCheaper
      }
    }
    val local = pts
      .sortWithinPartitions(col("price_c"), col("size").desc, col("id"))
      .mapPartitions(sweep)
    val global = local
      .repartition(1)
      .sortWithinPartitions(col("_2"), col("_3").desc, col("_1"))
      .mapPartitions(sweep)
    global.toDF("id", "price_c", "size").orderBy("id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_skyline" -> (skyline(_, _)),
    "q_median_2pass" -> (median2pass(_, _)),
    "q_asof_join" -> (asofJoin(_, _)),
    "q_asof_forward" -> (asofForward(_, _)),
    "q_asof_native" -> (asofNative(_, _)),
    "q_asof_tolerance" -> (asofTolerance(_, _)),
    "q_interval_native" -> (intervalNative(_, _)),
    "q_interval_bucketed" -> (intervalBucketed(_, _)),
    "q_salted_agg" -> (saltedAgg(_, _)),
    "q_percentiles" -> (percentiles(_, _)),
    "q_approx_distinct" -> (approxDistinct(_, _)),
    "wc_typed" -> (typedWordcount(_, _)),
    "wc_rdd" -> (rddWordcount(_, _)),
    "q_sql_entry" -> (sqlEntry(_, _)),
    "q_sql_pipe" -> (sqlPipe(_, _)),
    "q_sql_params" -> (sqlParams(_, _)),
    "q_group_by_all" -> (groupByAll(_, _)),
    "q_sql_identifier" -> (sqlIdentifier(_, _)),
    "q_cross_join" -> (crossJoinSmall(_, _)),
    "q_union_byname" -> (unionByNameQ(_, _))
  )

  val oracles: Map[String, String] = Map(
    // exact quadratic dominance anti-join — the relational form of the
    // skyline the Spark side computes with the two-phase sweep
    "q_skyline" ->
      """WITH pts AS (
        |  SELECT p_partkey AS id,
        |         CAST(round(p_retailprice * 100) AS BIGINT) AS price_c,
        |         CAST(p_size AS BIGINT) AS size
        |  FROM part)
        |SELECT id, price_c, size FROM pts a
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM pts b
        |  WHERE b.price_c <= a.price_c AND b.size >= a.size
        |    AND (b.price_c < a.price_c OR b.size > a.size))
        |ORDER BY id""".stripMargin,
    // order-statistic median: both middle ranks averaged (odd n → the two
    // ranks coincide), identical (a+b)/2 float step on both engines
    "q_median_2pass" ->
      """WITH v AS (SELECT o_totalprice AS x FROM orders),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM v),
        |r AS (SELECT x, row_number() OVER (ORDER BY x) AS rk FROM v)
        |SELECT nn.n,
        |       (SELECT avg(x) FROM r, nn
        |        WHERE rk IN ((nn.n + 1) // 2, (nn.n + 2) // 2)) AS median
        |FROM nn""".stripMargin,
    "q_interval_bucketed" ->
      """WITH bands AS (
        |  SELECT b AS band_id, CAST(b AS DOUBLE) * 8000 AS lo,
        |         CAST(b AS DOUBLE) * 8000 + 15999.99 AS hi
        |  FROM (SELECT unnest(range(0, 14)) AS b))
        |SELECT band_id, CAST(count(*) AS BIGINT) AS n_items,
        |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
        |            AS BIGINT) AS sum_price_cents
        |FROM lineitem JOIN bands ON l_extendedprice BETWEEN lo AND hi
        |GROUP BY band_id ORDER BY band_id""".stripMargin,
    "q_interval_native" ->
      """WITH bands AS (
        |  SELECT b AS band_id, CAST(b AS DOUBLE) * 8000 AS lo,
        |         CAST(b AS DOUBLE) * 8000 + 15999.99 AS hi
        |  FROM (SELECT unnest(range(0, 14)) AS b))
        |SELECT band_id, CAST(count(*) AS BIGINT) AS n_items,
        |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
        |            AS BIGINT) AS sum_price_cents
        |FROM lineitem JOIN bands ON l_extendedprice BETWEEN lo AND hi
        |GROUP BY band_id ORDER BY band_id""".stripMargin,
    "q_asof_forward" ->
      """SELECT event_id, user_id,
        |       CAST(floor(epoch(ts)) AS BIGINT) AS purchase_ts,
        |       CAST(floor(epoch(first_value(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
        |         OVER (PARTITION BY user_id ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id
        |               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))) AS BIGINT) AS next_click_ts
        |FROM events
        |QUALIFY event_type = 'purchase'
        |ORDER BY event_id""".stripMargin,
    "q_asof_join" ->
      """SELECT event_id, user_id,
        |       CAST(floor(epoch(ts)) AS BIGINT) AS purchase_ts,
        |       CAST(floor(epoch(last_value(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
        |         OVER (PARTITION BY user_id ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))) AS BIGINT) AS asof_click_ts
        |FROM events
        |QUALIFY event_type = 'purchase'
        |ORDER BY event_id""".stripMargin,
    "q_asof_native" ->
      """WITH p AS (SELECT event_id, user_id, ts FROM events
        |           WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, ts FROM events WHERE event_type = 'click')
        |SELECT p.event_id, p.user_id,
        |       CAST(floor(epoch(p.ts)) AS BIGINT) AS purchase_ts,
        |       CAST(floor(epoch(c.ts)) AS BIGINT) AS asof_click_ts
        |FROM p ASOF LEFT JOIN c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts
        |ORDER BY p.event_id""".stripMargin,
    "q_asof_tolerance" ->
      """WITH p AS (SELECT event_id, user_id, ts FROM events
        |           WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, ts FROM events WHERE event_type = 'click')
        |SELECT p.event_id, p.user_id,
        |       CAST(floor(epoch(p.ts)) AS BIGINT) AS purchase_ts,
        |       CAST(floor(epoch(max(c.ts))) AS BIGINT) AS asof_click_ts
        |FROM p LEFT JOIN c
        |  ON p.user_id = c.user_id AND c.ts <= p.ts
        | AND c.ts >= p.ts - INTERVAL 1 HOUR
        |GROUP BY p.event_id, p.user_id, p.ts
        |ORDER BY p.event_id""".stripMargin,
    "q_salted_agg" ->
      """SELECT l_returnflag, count(*) AS cnt, round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_percentiles" ->
      """SELECT l_returnflag,
        |       round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
        |       round(quantile_cont(l_extendedprice, 0.9), 4) AS p90
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "wc_rdd" ->
      """SELECT word, count(*) AS cnt
        |FROM (SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS word
        |      FROM documents)
        |WHERE word <> ''
        |GROUP BY word
        |ORDER BY cnt ASC, word ASC""".stripMargin,
    "wc_typed" ->
      """SELECT word, count(*) AS cnt
        |FROM (SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS word
        |      FROM documents)
        |WHERE word <> ''
        |GROUP BY word
        |ORDER BY cnt ASC, word ASC""".stripMargin,
    "q_group_by_all" ->
      """SELECT o_orderstatus, o_orderpriority,
        |       CAST(count(*) AS BIGINT) AS cnt,
        |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |         AS sum_price_c
        |FROM orders GROUP BY ALL ORDER BY ALL""".stripMargin,
    "q_sql_identifier" ->
      """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS cnt
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q_sql_pipe" ->
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS cnt,
        |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
        |            AS BIGINT) AS sum_price_c
        |FROM lineitem WHERE l_quantity >= 30
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_sql_params" ->
      """SELECT l_linestatus, CAST(count(*) AS BIGINT) AS cnt,
        |       CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)
        |         AS sum_qty_c
        |FROM lineitem
        |WHERE l_quantity >= 25 AND l_returnflag = 'R'
        |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,
    "q_sql_entry" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        |       round(sum(o_totalprice), 2) AS total
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE o_orderstatus = 'O'
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,
    "q_cross_join" ->
      """SELECT r_name, n_name FROM region CROSS JOIN nation
        |ORDER BY r_name, n_name""".stripMargin,
    "q_union_byname" ->
      """SELECT k, name FROM (
        |  SELECT s_suppkey AS k, s_name AS name FROM supplier
        |  UNION ALL
        |  SELECT c_custkey AS k, c_name AS name FROM customer WHERE c_custkey <= 10)
        |ORDER BY k, name""".stripMargin,
    // HLL estimates are engine-specific; the oracle checks the exact count
    // and that the Spark-side tolerance gate reported true.
    "q_approx_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_parts,
        |       TRUE AS within_tol
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
  )
}
