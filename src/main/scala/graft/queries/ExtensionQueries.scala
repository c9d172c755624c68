package graft.queries

import graft.Tables
import graft.functions.Aggregators
import graft.operators.WordCount
import graft.plans.Fnv1a64
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Queries exercising the engine-extension surfaces: the native Catalyst
  * Expression (Fnv1a64) and the typed Aggregator UDAF — the two custom hooks
  * SURVEY.md §4 budgets for. Both have exact oracles: FNV-1a is
  * re-expressible in DuckDB as a list_reduce fold, and the UDAF mirrors a
  * builtin sum.
  */
object ExtensionQueries {

  /** Reference shuffle-placement parity: every wc word routed to its reduce
    * bucket via ihash31 % 5 (the reference default n_reduce,
    * /root/reference/src/bin/client.rs:39-40) — bucket occupancy histogram.
    * Runs the custom Expression inside whole-stage codegen over the
    * exploded token stream.
    */
  def fnvBuckets(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(explode(WordCount.tokens(col("text"))).as("word"))
      .select(col("word"), (Fnv1a64.ihash31(col("word")) % 5).as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_tokens"), countDistinct(col("word")).as("n_words"))
      .orderBy("bucket")

  /** Deterministic ~10% hash sample: rows where ihash31(key) % 10 = 0,
    * then aggregate the sample. Unlike `df.sample` (RNG-seeded, partition-
    * layout-dependent) a content-hash sample reproduces EXACTLY on any
    * cluster, any partitioning, any engine — the property a 100 TB corpus
    * pipeline needs for debuggable subsets — and it pushes work to the
    * scan side (no shuffle added). Runs the native Fnv1a64 expression;
    * the oracle re-derives the same subset via the DuckDB HUGEINT fold.
    */
  def sampleHash(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(Fnv1a64.ihash31(col("l_orderkey").cast("string")) % 10 === 0)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_sampled"),
        round(sum("l_extendedprice"), 2).as("sum_price"))
      .orderBy("l_returnflag")

  /** Stratified deterministic sampling: a DIFFERENT hash-sample rate per
    * stratum (10% of returned, 20% of neither, 50% of accepted lines) —
    * the downsample-by-source knob every training-data mix uses
    * (oversample curated sources, downsample crawl). Same reproducibility
    * contract as `q_sample_hash` (content hash ⇒ engine/partition/
    * cluster-independent), zero added shuffle: the gate fuses into the
    * scan and only surviving rows reach the aggregate.
    */
  def sampleStratified(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .withColumn("rate_pct",
        when(col("l_returnflag") === "R", 10)
          .when(col("l_returnflag") === "N", 20)
          .otherwise(50))
      .filter(Fnv1a64.ihash31(
        concat_ws("-", col("l_orderkey"), col("l_linenumber"))) % 100 < col("rate_pct"))
      .groupBy("l_returnflag")
      .agg(max(col("rate_pct")).as("rate_pct"), count(lit(1)).as("n_sampled"),
        // per-row BIGINT cents summed exactly (q_tpch_q9 discipline): the
        // r8 sf10 sweep caught round(sum(double),2) flipping the last cent
        // on the ~7.5M-row 'A' stratum — order-dependent under ANY
        // partitioning, so rounding moves BEFORE the exact integer sum
        sum(round(col("l_extendedprice") * 100).cast("long")).as("sum_price_c"))
      .orderBy("l_returnflag")

  /** wc computed through the registered custom Aggregator instead of the
    * builtin count: flatMap to (word, 1) then udaf-sum — the literal
    * MapFn/ReduceFn decomposition of the reference (wc.rs:23-49), with
    * Spark inserting the partial/merge split the reference lacks.
    */
  def udafWordcount(s: SparkSession, d: String): DataFrame = {
    val longSum = udaf(Aggregators.LongSum, org.apache.spark.sql.Encoders.scalaLong)
    Tables.documents(s, d)
      .select(explode(WordCount.tokens(col("text"))).as("word"), lit(1L).as("one"))
      .groupBy("word")
      .agg(longSum(col("one")).as("cnt"))
      .orderBy(col("cnt").asc, col("word").asc)
  }

  /** Typed Aggregator mean vs builtin avg, per returnflag (rounded). */
  def udafMean(s: SparkSession, d: String): DataFrame = {
    val mean = udaf(Aggregators.Mean, org.apache.spark.sql.Encoders.scalaDouble)
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(round(mean(col("l_quantity")), 4).as("mean_qty"),
        count(lit(1)).as("cnt"))
      .orderBy("l_returnflag")
  }

  /** The DataSourceV2 surface end-to-end: scan the custom SeqSource
    * (graft.sources.SeqSource — column pruning + filter pushdown +
    * partition pruning implemented in the source) with an id-range
    * predicate the source absorbs and a residual (mod10) Spark keeps.
    * Only 8 of 16 planned slices survive pruning; the aggregate rides on
    * the narrowed generator output. Dsv2SourceSpec pins the pruning
    * behavior; this query pins the results.
    */
  def dsv2Scan(s: SparkSession, d: String): DataFrame =
    s.read.format("graft.sources.SeqSource")
      .option("rows", "100000").option("slices", "16").load()
      .filter(col("id") >= 25000 && col("id") < 75000 && col("mod10") < 5)
      .groupBy("mod10")
      .agg(count(lit(1)).as("n"), sum("id").as("sum_id"),
        min("label").as("min_label"), max("label").as("max_label"))
      .orderBy("mod10")

  /** The typed KeyValueGroupedDataset.reduceGroups surface — the literal
    * ReduceFn signature of the reference ((V, V) => V per key,
    * /root/reference/src/app/mod.rs:29-63) expressed on a typed Dataset.
    * Spark still runs it as partial-reduce → shuffle → final-reduce
    * (ObjectHashAggregate over the lambda), so the MapReduce combiner
    * optimization is preserved even though the fold is opaque Scala. The
    * builtin-aggregate form (q_agg_basic) beats this in codegen; this
    * entry exists because the typed fold IS the reference's API shape.
    * round-2dp on the double sum: reduceGroups folds in partition order
    * (the order-dependent-aggregate rule).
    */
  def typedReduce(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, d)
      .select(col("l_returnflag"), col("l_quantity"))
      .as[(String, Double)]
      .groupByKey(_._1)
      .mapValues { case (_, q) => (q, 1L) }
      .reduceGroups((a: (Double, Long), b: (Double, Long)) =>
        (a._1 + b._1, a._2 + b._2))
      .map { case (flag, (qty, n)) => (flag, qty, n) }
      .toDF("flag", "sum_qty", "n")
      .select(col("flag"), round(col("sum_qty"), 2).as("sum_qty"), col("n"))
      .orderBy("flag")
  }

  /** Typed cogroup — per-key access to BOTH relations' iterators in one
    * function (the generalized two-input reduce side; a join can only
    * express it by materializing the row product): orders cogroup
    * lineitem per orderkey, emitting order price, item count, and item
    * sum in a single pass. One co-partitioned exchange per side, no
    * group buffering beyond the key at hand. Item-less orders emit with
    * zero counts (the LEFT JOIN shape of the oracle).
    */
  def cogroupQ(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val o = Tables.orders(s, d).select(col("o_orderkey"), col("o_totalprice"))
      .as[(Long, Double)].groupByKey(_._1)
    val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_extendedprice"))
      .as[(Long, Double)].groupByKey(_._1)
    o.cogroup(li) { (key, os, ls) =>
      val orders = os.toSeq
      if (orders.isEmpty) Iterator.empty // no orphan lineitems in this schema
      else {
        var n = 0L
        var sum = 0.0
        ls.foreach { case (_, price) => n += 1; sum += price }
        Iterator((key, orders.head._2, n, sum))
      }
    }.toDF("o_orderkey", "o_totalprice", "n_items", "li_sum")
      .select(col("o_orderkey"), col("o_totalprice"), col("n_items"),
        round(col("li_sum"), 2).as("li_sum"))
      .orderBy("o_orderkey")
  }

  /** Secondary sort — the classic MapReduce pattern the reference's
    * per-partition sort exists to serve (F5, worker/mod.rs:147-198):
    * process each key's rows in VALUE order without materializing the
    * group. `flatMapSortedGroups` asks the engine for (key, sort-cols)
    * ordering, so Spark plants ONE exchange + one sort and hands the
    * function a sorted iterator — the streaming-group-processing
    * contract; take(3) shows the iterator short-circuits (no group-sized
    * buffer). Oracle: the equivalent rank-filter window.
    */
  def secondarySort(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, d)
      .select(col("l_returnflag"),
        // NTZ → epoch seconds via TIMESTAMP (session tz is pinned UTC)
        col("l_shipdate").cast("timestamp").cast("long").as("ship_s"),
        col("l_orderkey"), col("l_linenumber"))
      .as[(String, Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapSortedGroups(col("ship_s"), col("l_orderkey"),
        col("l_linenumber")) { (flag, it) =>
        it.take(3).zipWithIndex.map { case ((_, shipS, ok, ln), i) =>
          (flag, i + 1, shipS, ok, ln)
        }
      }
      .toDF("flag", "rk", "ship_s", "orderkey", "linenumber")
      .orderBy("flag", "rk")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_secondary_sort" -> (secondarySort(_, _)),
    "q_typed_reduce" -> (typedReduce(_, _)),
    "q_cogroup" -> (cogroupQ(_, _)),
    "q_dsv2_scan" -> (dsv2Scan(_, _)),
    "q_fnv_buckets" -> (fnvBuckets(_, _)),
    "q_sample_hash" -> (sampleHash(_, _)),
    "q_sample_stratified" -> (sampleStratified(_, _)),
    "q_udaf_wordcount" -> (udafWordcount(_, _)),
    "q_udaf_mean" -> (udafMean(_, _))
  )

  val oracles: Map[String, String] = Map(
    "q_secondary_sort" ->
      """WITH r AS (
        |  SELECT l_returnflag AS flag,
        |         CAST(floor(epoch(l_shipdate)) AS BIGINT) AS ship_s,
        |         l_orderkey AS orderkey,
        |         CAST(l_linenumber AS BIGINT) AS linenumber,
        |         row_number() OVER (PARTITION BY l_returnflag
        |           ORDER BY l_shipdate, l_orderkey, l_linenumber) AS rk
        |  FROM lineitem)
        |SELECT flag, CAST(rk AS INT) AS rk, ship_s, orderkey, linenumber
        |FROM r WHERE rk <= 3 ORDER BY flag, rk""".stripMargin,
    "q_typed_reduce" ->
      """SELECT l_returnflag AS flag, round(sum(l_quantity), 2) AS sum_qty,
        |       CAST(count(*) AS BIGINT) AS n
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_cogroup" ->
      """SELECT o_orderkey, o_totalprice,
        |       CAST(count(l_orderkey) AS BIGINT) AS n_items,
        |       round(coalesce(sum(l_extendedprice), 0), 2) AS li_sum
        |FROM orders LEFT JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY 1, 2 ORDER BY 1""".stripMargin,
    "q_dsv2_scan" ->
      """SELECT id % 10 AS mod10, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(id) AS BIGINT) AS sum_id,
        |       min('n' || id::VARCHAR) AS min_label,
        |       max('n' || id::VARCHAR) AS max_label
        |FROM (SELECT unnest(generate_series(25000, 74999))::BIGINT AS id)
        |WHERE id % 10 < 5 GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_sample_hash" ->
      s"""WITH h AS (
         |  SELECT l_returnflag, l_extendedprice,
         |         ${OracleSql.fnvIhash31("CAST(l_orderkey AS VARCHAR)")}::BIGINT AS ihash
         |  FROM lineitem)
         |SELECT l_returnflag, count(*) AS n_sampled,
         |       round(sum(l_extendedprice), 2) AS sum_price
         |FROM h WHERE ihash % 10 = 0
         |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_sample_stratified" ->
      s"""WITH h AS (
         |  SELECT l_returnflag, l_extendedprice,
         |         CASE WHEN l_returnflag = 'R' THEN 10
         |              WHEN l_returnflag = 'N' THEN 20
         |              ELSE 50 END AS rate_pct,
         |         ${OracleSql.fnvIhash31(
               "CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR)")}::BIGINT AS ihash
         |  FROM lineitem)
         |SELECT l_returnflag, max(rate_pct) AS rate_pct,
         |       count(*) AS n_sampled,
         |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         |         AS sum_price_c
         |FROM h WHERE ihash % 100 < rate_pct
         |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    // FNV-1a 64 as a HUGEINT fold (shared OracleSql helper), masked to 31
    // bits like the reference's ihash; Spark's signed-long % matches
    // DuckDB % on the masked value.
    "q_fnv_buckets" ->
      s"""WITH toks AS (
         |  SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS word
         |  FROM documents
         |), hashed AS (
         |  SELECT word,
         |         ${OracleSql.fnvIhash31("word")}::BIGINT AS ihash
         |  FROM toks WHERE word <> '')
        |SELECT ihash % 5 AS bucket, count(*) AS n_tokens,
        |       count(DISTINCT word) AS n_words
        |FROM hashed GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_udaf_wordcount" ->
      """SELECT word, count(*) AS cnt
        |FROM (SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS word
        |      FROM documents)
        |WHERE word <> ''
        |GROUP BY word
        |ORDER BY cnt ASC, word ASC""".stripMargin,
    "q_udaf_mean" ->
      """SELECT l_returnflag, round(avg(l_quantity), 4) AS mean_qty,
        |       count(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
  )
}
