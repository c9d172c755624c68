package graft.queries

import graft.Tables
import graft.operators.WordCount
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-corpus curation operators beyond dedup: benchmark
  * decontamination and repetition-based quality gating — the two standard
  * filters every published LLM data pipeline runs between raw crawl and
  * training shards (n-gram eval-overlap removal; "repetition" signals in
  * the style of the Gopher quality rules).
  *
  * Scale notes (100 TB): decontamination is the textbook asymmetric join —
  * the eval-benchmark n-gram set is MB-sized no matter how big the corpus
  * is, so it broadcasts and the corpus streams through one codegen'd
  * explode+hash-semi pass with zero corpus shuffle before the per-doc
  * count. The gram explosion multiplies rows ×~len but they die inside the
  * stage (filter-on-broadcast-join) without materializing. Repetition
  * signals are two corpus-linear explode→count passes whose shuffle keys
  * are (doc_id, token) — partial aggregation collapses each doc's repeats
  * map-side.
  */
object CurationQueries {

  /** Word n-grams as space-joined strings: positions 1..len-n+1 via a
    * sequence+slice HOF — stays inside whole-stage codegen, no UDF. The
    * short-doc guard matters because Spark's sequence(1, 0) yields a
    * DESCENDING [1,0], not an empty array.
    */
  private def wordGrams(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
      .otherwise(array().cast("array<string>"))

  /** Benchmark decontamination: documents sharing any word n-gram with the
    * eval set (here: doc_id < 20 stands in for the benchmark suite), with
    * the shared-distinct-gram count as evidence. Real pipelines use n=8-13;
    * n=4 keeps the tiny synthetic vocabulary from making the fixture
    * vacuous — the plan is identical for any n.
    *
    * Grams never exist as strings: the native WordGramFnv expression
    * fuses gram formation + FNV-1a into one codegen'd loop emitting
    * array<long>, so the distinct + join shuffles carry (long, long)
    * rows instead of ~8n-char strings (identical rationale to
    * dedup_exact's digest groupBy; measured ~4× vs the interpreted
    * transform+slice+concat HOF chain at sf0.1). The oracle re-derives
    * the same fold in DuckDB, so parity is exact by construction,
    * collisions included.
    */
  def decontam(s: SparkSession, d: String, n: Int = 4, evalMax: Long = 20L): DataFrame = {
    import org.apache.spark.sql.GraftSqlBridge.{column, expression}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    val grams = Tables.documents(s, d)
      .select(col("doc_id"),
        explode(graft.plans.WordGramFnv.wordGramFnv(WordCount.tokens(col("text")), n)).as("h"))
    val evalHashes = grams.filter(col("doc_id") < evalMax).select("h").distinct()
    // Bloom prefilter BEFORE the (doc_id, gram) distinct — the residual
    // cost of this query is that shuffle, and almost none of the corpus's
    // grams can match the tiny eval set. One ~50 KB sketch over the eval
    // hashes (the q_bloom_prejoin literal-sketch form — persistable and
    // reusable across decontam runs of the same eval suite) sheds
    // non-matching grams at the scan, so the distinct shuffles only
    // plausible matches. False positives are erased by the real broadcast
    // join below; the oracle is unchanged.
    val bfBytes = evalHashes
      .agg(column(new BloomFilterAggregate(expression(col("h")),
        Literal(50000L), Literal(400000L)).toAggregateExpression()).as("bf"))
      .head.getAs[Array[Byte]](0)
    grams.filter(col("doc_id") >= evalMax)
      .filter(column(BloomFilterMightContain(expression(lit(bfBytes)), expression(col("h")))))
      .select("doc_id", "h").distinct()
      .join(broadcast(evalHashes), "h")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shared"))
      .orderBy("doc_id")
  }

  /** SEMANTIC decontamination — the embedding-level companion of the
    * n-gram `decontam`: a train vector is contaminated if its cosine vs
    * ANY eval-set vector (vec_id % 10 == 0 stands in for the benchmark
    * embeddings) exceeds τ. The asymmetric shape is the production one:
    * eval sets are thousands of vectors against a 100 TB train corpus,
    * so the eval side BROADCASTS and the train side streams through one
    * codegen'd cosine pass + a vec-keyed max — no shuffle of the corpus,
    * no LSH needed because the small side is exhaustively checkable.
    * max() over bit-exact pairwise cosines is order-independent, so the
    * doubles match DuckDB exactly.
    */
  def decontamSemantic(s: SparkSession, d: String, tau: Double = 0.4): DataFrame = {
    val e = Tables.embeddings(s, d).select(col("vec_id"),
      col("embedding").cast("array<double>").as("v"))
    val evalSet = e.filter(col("vec_id") % 10 === 0)
      .select(col("v").as("xe")) // only the vector crosses the broadcast
    e.filter(col("vec_id") % 10 =!= 0)
      .crossJoin(broadcast(evalSet))
      .withColumn("sim",
        graft.plans.CosineSimilarity.cosine_sim(col("v"), col("xe")))
      .groupBy("vec_id")
      .agg(max("sim").as("max_sim"))
      .withColumn("contaminated", col("max_sim") > tau)
      .orderBy("vec_id")
  }

  /** Repetition signals per document, Gopher-rule style: top-word
    * fraction, repeated-token fraction, top-bigram fraction, and the
    * composite gate. All ratios divide exact integer counts, so the
    * doubles are bit-identical across engines with no rounding.
    */
  def repetition(s: SparkSession, d: String): DataFrame = {
    val toks = Tables.documents(s, d)
      .select(col("doc_id"), WordCount.tokens(col("text")).as("t"))
    val words = toks.select(col("doc_id"), explode(col("t")).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum(col("c")).as("n_tokens"), max(col("c")).as("top_word_cnt"),
        sum(when(col("c") >= 2, col("c")).otherwise(0L)).as("rep_tokens"))
    val bigrams = toks
      .select(col("doc_id"), explode(wordGrams(col("t"), 2)).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(max(col("c")).as("top_bigram_cnt"))
    words.join(bigrams, "doc_id")
      .select(col("doc_id"), col("n_tokens"),
        (col("top_word_cnt") / col("n_tokens")).as("top_word_frac"),
        (col("rep_tokens") / col("n_tokens")).as("rep_token_frac"),
        (col("top_bigram_cnt") / nullif(col("n_tokens") - 1, lit(0L)))
          .as("top_bigram_frac"),
        (col("top_word_cnt") / col("n_tokens") > 0.2 ||
          col("rep_tokens") / col("n_tokens") > 0.9).as("is_repetitive"))
      .orderBy("doc_id")
  }

  /** Preference-PAIR construction (the DPO/RLHF dataset builder): within
    * each source, the highest-scoring document becomes `chosen` and the
    * lowest-scoring `rejected` (score = distinct-token ratio, the
    * pipeline's shared quality proxy; ties to the smaller doc_id on both
    * ends), with the score margin carried for margin-weighted losses.
    * Two windows over one source-partitioned shuffle — the same plan per
    * prompt-group at any corpus size. A source with a single document
    * (or one where best == worst) yields chosen_doc == rejected_doc —
    * not a usable preference pair — so those degenerate rows are
    * FILTERED, not shipped: a DPO loader downstream would train on a
    * zero-margin self-pair otherwise.
    */
  def dpoPairs(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = split(col("text"), " ")
    val scored = Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        (size(array_distinct(toks)) / size(toks)).as("score"))
    val up = Window.partitionBy("source").orderBy(col("score").desc, col("doc_id"))
    val down = Window.partitionBy("source").orderBy(col("score").asc, col("doc_id"))
    val both = scored
      .withColumn("rn_top", row_number().over(up))
      .withColumn("rn_bot", row_number().over(down))
    val chosen = both.filter(col("rn_top") === 1)
      .select(col("source"), col("doc_id").as("chosen_doc"),
        col("score").as("chosen_score"))
    val rejected = both.filter(col("rn_bot") === 1)
      .select(col("source"), col("doc_id").as("rejected_doc"),
        col("score").as("rejected_score"))
    chosen.join(broadcast(rejected), "source")
      .filter(col("chosen_doc") =!= col("rejected_doc"))
      .withColumn("margin", round(col("chosen_score") - col("rejected_score"), 6))
      .orderBy("source")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipeline_dpo_pairs" -> (dpoPairs(_, _)),
    "pipeline_decontam" -> (decontam(_, _)),
    "pipeline_decontam_semantic" -> (decontamSemantic(_, _)),
    "text_repetition" -> (repetition(_, _))
  )

  val oracles: Map[String, String] = Map(
    "pipeline_dpo_pairs" ->
      """WITH scored AS (
        |  SELECT doc_id, source,
        |         len(list_distinct(string_split(text, ' ')))
        |           / len(string_split(text, ' ')) AS score
        |  FROM documents),
        |ranked AS (
        |  SELECT *,
        |         row_number() OVER (PARTITION BY source
        |             ORDER BY score DESC, doc_id) AS rn_top,
        |         row_number() OVER (PARTITION BY source
        |             ORDER BY score ASC, doc_id) AS rn_bot
        |  FROM scored),
        |c AS (SELECT source, doc_id AS chosen_doc, score AS chosen_score
        |      FROM ranked WHERE rn_top = 1),
        |r AS (SELECT source, doc_id AS rejected_doc, score AS rejected_score
        |      FROM ranked WHERE rn_bot = 1)
        |SELECT source, chosen_doc, chosen_score, rejected_doc,
        |       rejected_score,
        |       round(chosen_score - rejected_score, 6) AS margin
        |FROM c JOIN r USING (source)
        |WHERE chosen_doc <> rejected_doc
        |ORDER BY source""".stripMargin,
    // gram fingerprints re-derived as the FNV-1a HUGEINT fold (codepoint ==
    // byte on this ASCII corpus, as in q_fnv_buckets); signed/unsigned is a
    // bijection so join matches and distinct counts are identical
    "pipeline_decontam" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |         list_filter(string_split_regex(lower(text), '[^a-z]+'),
        |                     x -> x <> '') AS t
        |  FROM documents),
        |grams AS (
        |  SELECT doc_id, array_to_string(t[i:i+3], ' ') AS g
        |  FROM toks, unnest(range(1, greatest(len(t) - 2, 1))) AS r(i)),
        |hashed AS (
        |  SELECT doc_id,
        |         list_reduce(
        |           list_prepend(14695981039346656037::HUGEINT,
        |             list_transform(string_split_regex(g, ''),
        |                            c -> unicode(c)::HUGEINT)),
        |           (h, b) -> (xor(h, b) * 1099511628211::HUGEINT)
        |                     % 18446744073709551616::HUGEINT) AS h
        |  FROM grams),
        |eval_h AS (SELECT DISTINCT h FROM hashed WHERE doc_id < 20)
        |SELECT c.doc_id, count(DISTINCT c.h) AS n_shared
        |FROM hashed c JOIN eval_h e ON c.h = e.h
        |WHERE c.doc_id >= 20
        |GROUP BY c.doc_id ORDER BY c.doc_id""".stripMargin,
    "pipeline_decontam_semantic" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |           FROM embeddings),
        |ev AS (SELECT vec_id AS evid, v AS xe FROM e WHERE vec_id % 10 = 0),
        |tr AS (SELECT vec_id, v FROM e WHERE vec_id % 10 <> 0)
        |SELECT tr.vec_id,
        |       max(list_cosine_similarity(tr.v, ev.xe)) AS max_sim,
        |       max(list_cosine_similarity(tr.v, ev.xe)) > 0.4 AS contaminated
        |FROM tr, ev
        |GROUP BY tr.vec_id ORDER BY tr.vec_id""".stripMargin,
    "text_repetition" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |         list_filter(string_split_regex(lower(text), '[^a-z]+'),
        |                     x -> x <> '') AS t
        |  FROM documents),
        |wc AS (
        |  SELECT doc_id, w, count(*) AS c
        |  FROM (SELECT doc_id, unnest(t) AS w FROM toks)
        |  GROUP BY doc_id, w),
        |words AS (
        |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
        |         max(c) AS top_word_cnt,
        |         CAST(sum(CASE WHEN c >= 2 THEN c ELSE 0 END) AS BIGINT) AS rep_tokens
        |  FROM wc GROUP BY doc_id),
        |bg AS (
        |  SELECT doc_id, max(c) AS top_bigram_cnt
        |  FROM (SELECT doc_id, g, count(*) AS c
        |        FROM (SELECT doc_id, array_to_string(t[i:i+1], ' ') AS g
        |              FROM toks, unnest(range(1, greatest(len(t) - 0, 1))) AS r(i))
        |        GROUP BY doc_id, g)
        |  GROUP BY doc_id)
        |SELECT w.doc_id, n_tokens,
        |       top_word_cnt / n_tokens AS top_word_frac,
        |       rep_tokens / n_tokens AS rep_token_frac,
        |       top_bigram_cnt / nullif(n_tokens - 1, 0) AS top_bigram_frac,
        |       (top_word_cnt / n_tokens > 0.2 OR rep_tokens / n_tokens > 0.9)
        |         AS is_repetitive
        |FROM words w JOIN bg USING (doc_id)
        |ORDER BY doc_id""".stripMargin
  )
}
