package graft.queries

import graft.Tables
import graft.functions.TextFunctions.spaceTokens
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Remaining API-surface operators: the higher-order array-function
  * family (lambda builtins), exact distinct counting via roaring-bitmap
  * aggregates, and BM25 retrieval scoring — each the canonical Spark
  * form with a portable-SQL oracle.
  */
object SurfaceQueries {

  /** The higher-order-function family over array columns — exists /
    * forall / aggregate (left fold) / zip_with / transform — all codegen'd
    * builtins, zero UDFs. Folds are index-ordered on both engines, so
    * sums match bit-for-bit before the 6dp display rounding.
    */
  def hofFuncs(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("v"))
      .select(col("vec_id"),
        exists(col("v"), x => x > 0.2).as("has_big"),
        forall(col("v"), x => abs(x) < 1.0).as("all_small"),
        round(aggregate(col("v"), lit(0.0), (acc, x) => acc + x), 6).as("s_sum"),
        round(aggregate(zip_with(col("v"), reverse(col("v")), (a, b) => a * b),
          lit(0.0), (acc, x) => acc + x), 6).as("dot_rev"),
        round(array_max(transform(col("v"), x => abs(x))), 6).as("max_abs"))
      .orderBy("vec_id")

  /** Exact distinct counting via bitmap aggregates (Spark 3.5+ roaring
    * surface): bucket on bitmap_bucket_number, OR the per-bucket bitmaps,
    * sum the bit counts. Same answer as COUNT(DISTINCT) — the oracle —
    * but mergeable: at 100 TB the per-bucket bitmaps combine across
    * partitions/segments without re-scanning, which COUNT(DISTINCT)'s
    * shuffle-all-values plan cannot do.
    */
  def bitmapDistinct(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("event_type"), expr("bitmap_bucket_number(user_id)").as("bkt"))
      .agg(expr("bitmap_count(bitmap_construct_agg(bitmap_bit_position(user_id)))")
        .as("bc"))
      .groupBy("event_type")
      .agg(sum("bc").as("nd_users"))
      .orderBy("event_type")

  /** BM25 document scoring for a fixed 3-term query (Robertson/Lucene
    * idf = ln(1 + (N-df+0.5)/(df+0.5)), k1=1.2, b=0.75) — the sparse-
    * retrieval ranking complement to the dense sim_* family.
    *
    * Single-pass shape: per-doc term frequencies come from HOF
    * `size(filter(...))` over the token array (no explode, no token
    * shuffle — the inverted-index route needs one only when the query
    * set is large/dynamic; for a bounded literal query the scan-side
    * counters win at any corpus size). Corpus statistics (N, avgdl,
    * per-term df) are ONE 1-row broadcast; the only exchange in the
    * plan is the final top-k (TakeOrderedAndProject). Per-doc scores
    * sum the 3 term scores in FIXED written order on both engines and
    * round to 6dp before the cut so ranking can't drift.
    */
  def bm25(s: SparkSession, d: String,
      terms: Seq[String] = Seq("data", "query", "spark")): DataFrame = {
    val base = Tables.documents(s, d)
      .select(col("doc_id"),
        filter(spaceTokens(col("text")), t => t =!= "").as("toks"))
      .select(Seq(col("doc_id"), size(col("toks")).cast("long").as("dl")) ++
        terms.zipWithIndex.map { case (t, i) =>
          size(filter(col("toks"), x => x === lit(t))).cast("long").as(s"tf$i")
        }: _*)
    val statCols = Seq(count(lit(1)).as("n_docs"),
      (sum("dl") / count(lit(1))).as("avgdl")) ++
      terms.indices.map(i =>
        sum(when(col(s"tf$i") > 0, 1L).otherwise(0L)).as(s"df$i"))
    val stats = base.agg(statCols.head, statCols.tail: _*)
    def term(i: Int) =
      log(lit(1.0) + (col("n_docs") - col(s"df$i") + 0.5) / (col(s"df$i") + 0.5)) *
        (col(s"tf$i") * 2.2) /
        (col(s"tf$i") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl")))
    base.crossJoin(broadcast(stats))
      .filter(terms.indices.map(i => col(s"tf$i")).reduce(_ + _) > 0)
      .select(col("doc_id"),
        round(terms.indices.map(term).reduce(_ + _), 6).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(20)
  }

  /** Spark 4's `DataFrame.transpose()` — rows become columns keyed by the
    * first column's values (here the five market segments), the long-to-
    * wide flip analysts otherwise hand-write as a pivot. Transposition is
    * only sane on ALREADY-AGGREGATED, decision-sized frames (the column
    * count is data-dependent), which is exactly how it is used here: the
    * transposed input is a 5-row aggregate of one linear scan. */
  def transposeQ(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .groupBy("c_mktsegment").count().orderBy("c_mktsegment")
      .transpose()

  /** SQL-level dynamic execution: a query TEMPLATE held in a session
    * variable, specialized with `replace` and run via Spark 4's
    * EXECUTE IMMEDIATE with a named USING parameter — the surface DBAs
    * reach for when the query text itself is data/config. (q_sql_params
    * covers the API-side parameterized sql(); this is the SQL-side
    * counterpart.) The dynamic statement is an ordinary aggregate, so it
    * plans/pushes down exactly like static text. */
  def executeImmediate(s: SparkSession, d: String): DataFrame = {
    Tables.orders(s, d).createOrReplaceTempView("orders_ei_v")
    s.sql("DECLARE OR REPLACE ei_tmpl STRING")
    s.sql("""SET VAR ei_tmpl =
      'SELECT o_orderpriority,
              CAST(count(*) AS BIGINT) AS n,
              CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                AS sum_cents
       FROM {tbl} WHERE o_orderkey % 7 = :bucket
       GROUP BY o_orderpriority ORDER BY o_orderpriority'""")
    s.sql("EXECUTE IMMEDIATE replace(ei_tmpl, '{tbl}', 'orders_ei_v') " +
      "USING 3 AS bucket")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_hof_funcs" -> (hofFuncs(_, _)),
    "q_bitmap_distinct" -> (bitmapDistinct(_, _)),
    "text_bm25" -> (bm25(_, _)),
    "q_transpose" -> (transposeQ(_, _)),
    "q_execute_immediate" -> (executeImmediate(_, _))
  )

  val oracles: Map[String, String] = Map(
    "q_transpose" ->
      """SELECT 'count' AS key,
        |  CAST(sum(CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 1 ELSE 0 END)
        |       AS BIGINT) AS "AUTOMOBILE",
        |  CAST(sum(CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END)
        |       AS BIGINT) AS "BUILDING",
        |  CAST(sum(CASE WHEN c_mktsegment = 'FURNITURE' THEN 1 ELSE 0 END)
        |       AS BIGINT) AS "FURNITURE",
        |  CAST(sum(CASE WHEN c_mktsegment = 'HOUSEHOLD' THEN 1 ELSE 0 END)
        |       AS BIGINT) AS "HOUSEHOLD",
        |  CAST(sum(CASE WHEN c_mktsegment = 'MACHINERY' THEN 1 ELSE 0 END)
        |       AS BIGINT) AS "MACHINERY"
        |FROM customer""".stripMargin,
    "q_execute_immediate" ->
      """SELECT o_orderpriority,
        |       CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |         AS sum_cents
        |FROM orders WHERE o_orderkey % 7 = 3
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_hof_funcs" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |           FROM embeddings)
        |SELECT vec_id,
        |       len(list_filter(v, x -> x > 0.2)) > 0 AS has_big,
        |       len(list_filter(v, x -> NOT (abs(x) < 1.0))) = 0 AS all_small,
        |       round(list_reduce(list_prepend(0.0::DOUBLE, v),
        |                         (acc, x) -> acc + x), 6) AS s_sum,
        |       round(list_reduce(list_prepend(0.0::DOUBLE,
        |               list_transform(generate_series(1, len(v)),
        |                              i -> v[i] * v[len(v) - i + 1])),
        |             (acc, x) -> acc + x), 6) AS dot_rev,
        |       round(list_max(list_transform(v, x -> abs(x))), 6) AS max_abs
        |FROM e ORDER BY vec_id""".stripMargin,
    "q_bitmap_distinct" ->
      """SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS nd_users
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "text_bm25" ->
      """WITH base AS (
        |  SELECT doc_id, len(toks)::BIGINT AS dl,
        |         len(list_filter(toks, x -> x = 'data'))::BIGINT AS tf0,
        |         len(list_filter(toks, x -> x = 'query'))::BIGINT AS tf1,
        |         len(list_filter(toks, x -> x = 'spark'))::BIGINT AS tf2
        |  FROM (SELECT doc_id,
        |               list_filter(string_split(text, ' '), t -> t <> '') AS toks
        |        FROM documents)),
        |stats AS (
        |  SELECT count(*) AS n_docs, sum(dl) / count(*) AS avgdl,
        |         sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS df0,
        |         sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1,
        |         sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2
        |  FROM base)
        |SELECT doc_id,
        |       round(
        |         ln(1.0 + (n_docs - df0 + 0.5) / (df0 + 0.5)) * (tf0 * 2.2) /
        |           (tf0 + 1.2 * (0.25 + 0.75 * dl / avgdl)) +
        |         ln(1.0 + (n_docs - df1 + 0.5) / (df1 + 0.5)) * (tf1 * 2.2) /
        |           (tf1 + 1.2 * (0.25 + 0.75 * dl / avgdl)) +
        |         ln(1.0 + (n_docs - df2 + 0.5) / (df2 + 0.5)) * (tf2 * 2.2) /
        |           (tf2 + 1.2 * (0.25 + 0.75 * dl / avgdl)), 6) AS score
        |FROM base, stats
        |WHERE tf0 + tf1 + tf2 > 0
        |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin
  )
}
