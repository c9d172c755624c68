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
        transform(col("embedding"), x => x.cast("double")).as("v"))
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
    * retrieval ranking complement to the dense sim_* family. Corpus
    * statistics (N, avgdl) are a 1-row broadcast; per-term df is a
    * 3-row broadcast; the scan streams once. Scores are rounded to 6dp
    * BEFORE the top-20 cut so both engines rank identically.
    */
  def bm25(s: SparkSession, d: String,
      terms: Seq[String] = Seq("data", "query", "spark")): DataFrame = {
    val toks = Tables.documents(s, d)
      .select(col("doc_id"), explode(spaceTokens(col("text"))).as("tok"))
      .filter(col("tok") =!= "")
    val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"),
      (sum("dl") / count(lit(1))).as("avgdl"))
    val qtoks = toks.filter(col("tok").isInCollection(terms))
    val df = qtoks.groupBy("tok").agg(countDistinct("doc_id").as("df"))
    val tf = qtoks.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    tf.join(broadcast(df), "tok")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("term_score",
        log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)) *
          (col("tf") * 2.2) /
          (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))))
      .groupBy("doc_id")
      .agg(round(sum("term_score"), 6).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(20)

  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_hof_funcs" -> (hofFuncs(_, _)),
    "q_bitmap_distinct" -> (bitmapDistinct(_, _)),
    "text_bm25" -> (bm25(_, _))
  )

  val oracles: Map[String, String] = Map(
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
      """WITH toks AS (
        |  SELECT doc_id, t AS tok FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents)
        |  WHERE t <> ''),
        |dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
        |stats AS (SELECT count(*) AS n_docs, sum(dl) / count(*) AS avgdl FROM dl),
        |qt AS (SELECT * FROM toks WHERE tok IN ('data', 'query', 'spark')),
        |df AS (SELECT tok, count(DISTINCT doc_id) AS df FROM qt GROUP BY tok),
        |tf AS (SELECT doc_id, tok, count(*) AS tf FROM qt GROUP BY doc_id, tok),
        |scored AS (
        |  SELECT tf.doc_id,
        |         ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) *
        |           (tf * 2.2) /
        |           (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)) AS term_score
        |  FROM tf JOIN df USING (tok) JOIN dl USING (doc_id), stats)
        |SELECT doc_id, round(sum(term_score), 6) AS score
        |FROM scored GROUP BY doc_id
        |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin
  )
}
