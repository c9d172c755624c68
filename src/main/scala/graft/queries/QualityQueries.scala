package graft.queries

import graft.Tables
import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-3 corpus-quality + selection operators: inter-document boilerplate
  * detection, trigram-LM document scoring (the perplexity-filter shape),
  * vocabulary/OOV coverage, token-budget selection (the data-mixing knob),
  * semantic dedup (SemDeDup's cluster-then-verify shape), plus two engine
  * surfaces (the Observation metrics API and repartition+sortWithinPartitions).
  *
  * Scale notes live on each method; the shared theme: every pass is one
  * explode + one key shuffle (linear in the corpus), global decisions ride
  * on aggregated score tables that are orders of magnitude smaller than the
  * corpus, and pairwise work only ever happens inside LSH/cluster buckets.
  */
object QualityQueries {

  /** Inter-document boilerplate detection — the corpus-level analog of
    * CCNet's duplicated-line removal for a corpus without line structure:
    * disjoint 4-token spans (stride 4), a span seen in ≥ 2 distinct docs is
    * boilerplate, and a doc keeps only if < 20% of its spans are boilerplate
    * (INTEGER compare n_boiler*5 < n_spans — no float boundary).
    *
    * Shape: one explode (n/4 spans per doc) + one span-keyed count-distinct
    * + one join back on span. At 100 TB spans hash to 64-bit before the
    * shuffle (xxhash64 here) so the exchange carries (long, long) rows, and
    * the frequent-span set (a tiny fraction of the span universe) broadcasts.
    */
  def boilerplate(s: SparkSession, d: String, minDocs: Long = 2L): DataFrame = {
    val toks = spaceTokens(col("text"))
    val spans = Tables.documents(s, d)
      .select(col("doc_id"), toks.as("toks"))
      .select(col("doc_id"),
        explode(sequence(lit(1), greatest(size(col("toks")) - 3, lit(1)),
          lit(4))).as("start"), col("toks"))
      .select(col("doc_id"),
        xxhash64(array_join(slice(col("toks"), col("start"), lit(4)), " "))
          .as("span"))
    val frequent = spans.groupBy("span")
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= minDocs)
      .select(col("span"), lit(1).as("hit"))
    spans.join(broadcast(frequent), Seq("span"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_spans"), count(col("hit")).as("n_boiler"))
      .withColumn("keep", col("n_boiler") * 5 < col("n_spans"))
      .orderBy("doc_id")
  }

  /** Trigram-LM document scoring — the perplexity-filter pass of corpus
    * curation: train an exact trigram model on the corpus itself
    * (p(w3|w1,w2) = cnt/context_total, BIGINT÷BIGINT exact doubles), score
    * every document by its mean log-probability, flag docs above a
    * threshold. avg(ln p) sums doubles in engine-dependent order → rounded
    * 6dp (the order-dependent-aggregate rule, DESIGN.md), and the flag
    * compares the ROUNDED score against the constant so no boundary row can
    * flip between engines.
    *
    * Shape: ONE trigram-instance shuffle. Instead of building a model
    * table and sort-merge-joining the instances back on three string keys
    * (3 exchanges + 3 sorts), both model statistics ride as window counts
    * over the SAME exchange: repartition by context (w1, w2), sort once by
    * (w1, w2, w3) — hash-partitioning on the context subset satisfies the
    * trigram window's ClusteredDistribution, and the context window reuses
    * the sort prefix. cnt/total are the identical BIGINT ratios the join
    * produced (bit-same doubles); only the plan changed (4.6 s → 1.4 s at
    * sf0.1). At 100 TB the context partitions are vocabulary-bounded, so
    * no window partition is corpus-sized.
    */
  def perplexity(s: SparkSession, d: String, flagAt: Double = -4.0): DataFrame = {
    val docTris = Tables.documents(s, d)
      .select(col("doc_id"), explode(trigrams(spaceTokens(col("text")))).as("g"))
      .select(col("doc_id"), col("g.w1").as("w1"), col("g.w2").as("w2"),
        col("g.w3").as("w3"))
    val wTri = Window.partitionBy("w1", "w2", "w3")
    val wCtx = Window.partitionBy("w1", "w2")
    docTris
      .repartition(col("w1"), col("w2"))
      .withColumn("cnt", count(lit(1)).over(wTri))
      .withColumn("total", count(lit(1)).over(wCtx))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tri"),
        round(avg(log(col("cnt") / col("total"))), 6).as("avg_logp"))
      .withColumn("flag_keep", col("avg_logp") > flagAt)
      .orderBy("doc_id")
  }

  /** Vocabulary coverage / OOV rate per document against the corpus top-20
    * vocabulary (count DESC, token ASC — total order, no hash ties). The
    * tokenizer-coverage screen of corpus prep. The vocabulary is aggregated
    * (tiny) and broadcast; the per-doc pass is one explode + one doc-keyed
    * re-agg; n_oov/n_tok is BIGINT÷BIGINT — exact on both engines.
    */
  def vocabCoverage(s: SparkSession, d: String, topV: Int = 20): DataFrame = {
    val toksTbl = Tables.documents(s, d)
      .select(col("doc_id"), explode(spaceTokens(col("text"))).as("tok"))
    val vocab = toksTbl.groupBy("tok").agg(count(lit(1)).as("cnt"))
      .withColumn("rk", row_number().over(
        Window.orderBy(col("cnt").desc, col("tok").asc)))
      .filter(col("rk") <= topV)
      .select(col("tok"), lit(1).as("in_vocab"))
    toksTbl.join(broadcast(vocab), Seq("tok"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tok"),
        (count(lit(1)) - count(col("in_vocab"))).as("n_oov"))
      .withColumn("oov_frac", col("n_oov") / col("n_tok"))
      .orderBy("doc_id")
  }

  /** Token-budget selection — the data-mixing primitive: keep the
    * highest-quality documents (quality = distinct-token ratio, an exact
    * BIGINT÷BIGINT double; tie-break doc_id) until the token budget
    * (¼ of the corpus, INTEGER arithmetic) is exhausted.
    *
    * Scale shape: the greedy "global cumulative sum ≤ budget" is computed
    * WITHOUT any unpartitioned window (r12) — per-score token totals get
    * their exclusive prefix from TwoPass.exclusivePrefixSum (range
    * partitions + triangular offset join), and each doc then needs just
    * its within-score-group running total (windows partitioned by score,
    * bounded groups). global_cum = group_prefix + within_group_cum, so
    * selection is a filter and no step is ever single-partition.
    */
  def tokenBudget(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), spaceTokens(col("text")).as("toks"))
      .select(col("doc_id"), size(col("toks")).cast("long").as("ntok"),
        size(array_distinct(col("toks"))).cast("long").as("ndis"))
      .withColumn("score", col("ndis") / col("ntok"))
    val budget = docs.agg((sum("ntok") / lit(4)).cast("long").as("b"))
    // r12 (guide §2 / VERDICT): the per-score prefix rode an UNPARTITIONED
    // window unconditionally — distinct (ndis, ntok) ratios are row-scale
    // at 100 TB, a single-partition sort in disguise. Hybrid now
    // (rationale at TwoPass.smallInput): classic window under the
    // footer-stats doc-count bound (distinct scores ≤ documents), the
    // TwoPass range-partitioned exclusive prefix past it — identical
    // values (TwoPassSpec; the pure two-pass form was oracle-gated green
    // at all three fixture SFs before the gate landed).
    val grouped = docs.groupBy("score").agg(sum("ntok").as("tok_g"))
    val perScore = (
      if (TwoPass.smallInput(s, Tables.rowCount(s, d, "documents")))
        grouped.withColumn("prefix",
          sum("tok_g").over(Window.orderBy(col("score").desc)) - col("tok_g"))
      else TwoPass.exclusivePrefixSum(grouped,
        Seq(col("score").desc), "tok_g", "prefix"))
      .select("score", "prefix")
    val wIn = Window.partitionBy("score").orderBy("doc_id")
    docs
      .withColumn("cum_in", sum("ntok").over(wIn))
      .join(broadcast(perScore), "score")
      .withColumn("cum_tok", col("prefix") + col("cum_in"))
      .join(broadcast(budget), col("cum_tok") <= col("b"))
      .select(col("doc_id"), col("score"), col("ntok"), col("cum_tok"))
      .orderBy(col("score").desc, col("doc_id"))
  }

  /** Per-source quality-quantile gate — the selection knob real curation
    * pipelines use instead of one global threshold: a doc is kept if its
    * quality (distinct-token ratio) is at or above its OWN source's 25th
    * percentile, so no source is wiped out by a global bar and each
    * source's worst quartile is dropped. The quantile is rank-based
    * (percent_rank = (rank-1)/(n-1), exact integer→double arithmetic in
    * both engines — no interpolated-percentile float drift). The oracle
    * pins q = 0.25; a different quantile needs a matching oracle edit —
    * the registry binding always uses the default.
    *
    * Scale shape: one corpus scan for scores, then a single window
    * partitioned by source — sources are a bounded set. The decision is
    * emitted as a `keep` FLAG (downstream filters on it; emitting the
    * flag keeps the audit trail a real pipeline wants). The final
    * orderBy(doc_id) is output-determinism for the gate, not part of the
    * operator's data path.
    */
  def sourceQuantiles(s: SparkSession, d: String, q: Double = 0.25): DataFrame = {
    val toks = spaceTokens(col("text"))
    val w = Window.partitionBy("source").orderBy("score")
    Tables.documents(s, d)
      .select(col("doc_id"), col("source"), distinctTokenRatio(toks).as("score"))
      .withColumn("pr", percent_rank().over(w))
      .withColumn("keep", col("pr") >= q)
      .select(col("doc_id"), col("source"), col("score"), col("pr"), col("keep"))
      .orderBy("doc_id")
  }

  /** Semantic dedup (SemDeDup shape): coarse-cluster the embedding corpus
    * (8 cells seeded from the first 8 vectors — the same train-then-apply
    * quantizer pattern as sim_ivf_topk; ties → smallest cell id), then find
    * near-duplicate pairs ONLY within cells (cosine > τ, fused-codegen
    * verify). Pairwise work drops from O(n²) to Σ|cell|² — 8× here, and in
    * a real clustered corpus the cell count scales with n so intra-cell
    * pairs stay bounded. Pair generation uses the per-bucket sorted-id-list
    * shape (posexplode + sliced explode — never a self-join). Fully
    * deterministic → fully oracled, like the IVF family it reuses.
    *
    * Every cosine-derived value is micro-rounded to BIGINT 1e-6 units
    * BEFORE any decision (argmax cell election, the τ threshold) and in
    * the OUTPUT. The sf1 sweep motivated this: this query's 116k-pair
    * surface was the first big enough to expose the unclamped-cosine
    * ulp class (replica self-pairs at 1.0000000000000002 vs DuckDB's
    * clamped 1.0 — since fixed in CosineSimilarity itself), and integer
    * micro-units additionally keep the argmax, the threshold, and the
    * hash compare on BIGINT — the proven output storage class under the
    * type-frontier rule, and the MatchQueries round-before-decide
    * precedent. Ties → lowest cell id in both engines.
    */
  def semanticDedup(s: SparkSession, d: String, cells: Int = 8,
      tau: Double = 0.4): DataFrame = {
    import graft.plans.CosineSimilarity.cosine_sim
    val base = Tables.embeddings(s, d)
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("v"))
    val cents: Array[Array[Double]] = base.filter(col("vec_id") < cells)
      .collect().sortBy(_.getLong(0)).map(_.getSeq[Double](1).toArray)
    require(cents.length == cells,
      s"semantic quantizer expects contiguous vec_ids 0..${cells - 1}; found ${cents.length}")
    val cLit: Int => Column = j => array(cents(j).map(lit(_)): _*)
    val sims = array((0 until cells).map(j =>
      round(cosine_sim(col("v"), cLit(j)) * lit(1000000L)).cast("long")): _*)
    val assigned = base.withColumn("sims", sims)
      .withColumn("cell",
        (array_position(col("sims"), array_max(col("sims"))) - 1).cast("int"))
      .select("cell", "vec_id", "v")
    val buckets = assigned.groupBy("cell")
      .agg(sort_array(collect_list(col("vec_id"))).as("ids"))
    // blocked pair generation: with 8 fixture cells the plain shape's
    // parallelism is 8 tasks (1 after AQE coalescing) — the blocked form
    // scales task count with PAIR volume (see BucketPairs.pairsBlocked)
    val pairs = BucketPairs.pairsBlocked(buckets, "ids", "va", "vb",
      keep = Seq("cell"))
    val byId = assigned.select(col("vec_id"), col("v"))
    // the candidate-pair stream is the BIG side (Σ|cell|² rows) and its
    // Catalyst estimate descends from the 8-row buckets aggregate, so the
    // vector-table joins are hinted by MEASURED vector count (the
    // edgesFitBroadcast precedent; rationale at
    // SimilarityQueries.vecsFitBroadcast) — broadcast keeps the pair
    // stream pipelined, never shuffled; past the budget it degrades to
    // the shuffle that scale genuinely needs
    // r12: footer-metadata count (zero Spark jobs per fresh plan; same
    // exact value) — see Tables.rowCount
    val fit = SimilarityQueries.vecsFitBroadcast(s, Tables.rowCount(s, d, "embeddings"))
    def vside(df: DataFrame): DataFrame = if (fit) broadcast(df) else df
    pairs
      .join(vside(byId.select(col("vec_id").as("va"), col("v").as("xa"))), Seq("va"))
      .join(vside(byId.select(col("vec_id").as("vb"), col("v").as("xb"))), Seq("vb"))
      .withColumn("sim_e6",
        round(cosine_sim(col("xa"), col("xb")) * lit(1000000L)).cast("long"))
      .filter(col("sim_e6") > lit((tau * 1000000L).round))
      .select(col("cell").cast("long").as("cell"), col("va"), col("vb"),
        col("sim_e6"))
      .orderBy("va", "vb")
  }

  /** The Observation API surface — `df.observe(...)` collects aggregate
    * metrics as a side effect of a query's own action (an accumulator-based
    * pass, NO extra scan of the input): the lineage-free way to get row
    * counts / sums for data-quality monitoring in the same job that writes
    * the output. The observed metrics come back as a one-row frame.
    * round(sum(double)) follows the order-dependent-aggregate rule.
    */
  def observeMetrics(s: SparkSession, d: String): DataFrame = {
    val obs = org.apache.spark.sql.Observation(
      s"graft_obs_${obsCounter.incrementAndGet()}")
    val filtered = Tables.lineitem(s, d)
      .filter(col("l_discount") > 0.05)
      .observe(obs, count(lit(1)).as("n_rows"),
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        max(col("l_quantity")).as("max_qty"))
    filtered.write.format("noop").mode("overwrite").save()
    import s.implicits._
    val m = obs.get
    Seq((m("n_rows").asInstanceOf[Long], m("sum_qty").asInstanceOf[Double],
      m("max_qty").asInstanceOf[Double]))
      .toDF("n_rows", "sum_qty", "max_qty")
  }
  private val obsCounter = new java.util.concurrent.atomic.AtomicInteger(0)

  /** repartition(col) + sortWithinPartitions — the DataFrame form of SQL
    * DISTRIBUTE BY / SORT BY (the explicit-layout surface: co-locate rows by
    * key, order within each task, e.g. before a partitioned sorted write).
    * The downstream groupBy reuses the exchange (hashpartitioning(l_returnflag)
    * already satisfies the agg's distribution — one shuffle total, verified
    * in PlanShapeSpec), which is exactly why pre-partitioning by the
    * consumer's key is a scale lever and not a wasted pass.
    */
  def repartitionSort(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .repartition(col("l_returnflag"))
      .sortWithinPartitions(col("l_returnflag"), col("l_orderkey"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        // BIGINT cents summed exactly (q_tpch_q9 discipline) — the r8 sf10
        // sweep caught the last cent of round(sum(double),2) flipping on
        // the ~5M-row per-flag strata
        sum(round(col("l_extendedprice") * 100).cast("long")).as("sum_price_c"))
      .orderBy("l_returnflag")

  /** The END-TO-END curation pipeline as ONE declarative plan — the
    * composition a training-data run actually executes, chaining stages
    * that are each independently oracled elsewhere: quality + language
    * gates (pipeline_clean_corpus's rules) → exact dedup keep-min →
    * diversity score (token_budget's distinct/ntok) → greedy budget
    * selection at half the gated corpus tokens. Catalyst fuses the gates
    * into the scan; the only shuffles are the dedup groupBy and the
    * selection's score-ordered window — the same count a hand-built
    * MapReduce chain would need, minus its three intermediate
    * materializations.
    */
  def curationE2e(s: SparkSession, d: String): DataFrame = {
    val toks = spaceTokens(col("text"))
    val gated = Tables.documents(s, d)
      .filter(col("n_chars") >= 100 && size(toks) >= 20 &&
        array_contains(toks, "the"))
      .select(col("doc_id"), col("text"))
    val kept = gated
      .groupBy(md5(col("text").cast("binary")).as("fp"))
      .agg(min("doc_id").as("doc_id"))
    val scored = gated.join(kept, "doc_id")
      .select(col("doc_id"), size(spaceTokens(col("text"))).cast("long").as("ntok"),
        size(array_distinct(spaceTokens(col("text")))).cast("long").as("ndis"))
      .withColumn("score", col("ndis") / col("ntok"))
    val budget = scored.agg((sum("ntok") / lit(2)).cast("long").as("b"))
    // r12: hybrid two-pass prefix, same rationale and gate as tokenBudget
    val grouped = scored.groupBy("score").agg(sum("ntok").as("tok_g"))
    val perScore = (
      if (TwoPass.smallInput(s, Tables.rowCount(s, d, "documents")))
        grouped.withColumn("prefix",
          sum("tok_g").over(Window.orderBy(col("score").desc)) - col("tok_g"))
      else TwoPass.exclusivePrefixSum(grouped,
        Seq(col("score").desc), "tok_g", "prefix"))
      .select("score", "prefix")
    scored
      .withColumn("cum_in",
        sum("ntok").over(Window.partitionBy("score").orderBy("doc_id")))
      .join(broadcast(perScore), "score")
      .withColumn("cum_tok", col("prefix") + col("cum_in"))
      .join(broadcast(budget), col("cum_tok") <= col("b"))
      .select(col("doc_id"), col("score"), col("ntok"), col("cum_tok"))
      .orderBy(col("score").desc, col("doc_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipeline_e2e_curation" -> (curationE2e(_, _)),
    "dedup_boilerplate" -> (boilerplate(_, _)),
    "text_perplexity" -> (perplexity(_, _)),
    "text_vocab_coverage" -> (vocabCoverage(_, _)),
    "pipeline_token_budget" -> (tokenBudget(_, _)),
    "pipeline_source_quantiles" -> (sourceQuantiles(_, _)),
    "dedup_semantic" -> (semanticDedup(_, _)),
    "q_observe" -> (observeMetrics(_, _)),
    "q_repartition_sort" -> (repartitionSort(_, _))
  )

  val oracles: Map[String, String] = Map(
    "pipeline_source_quantiles" ->
      """SELECT doc_id, source, score,
        |       percent_rank() OVER (PARTITION BY source ORDER BY score) AS pr,
        |       percent_rank() OVER (PARTITION BY source ORDER BY score) >= 0.25
        |         AS keep
        |FROM (SELECT doc_id, source,
        |             len(list_distinct(l))::DOUBLE / len(l) AS score
        |      FROM (SELECT doc_id, source, string_split(text, ' ') AS l
        |            FROM documents))
        |ORDER BY doc_id""".stripMargin,
    "pipeline_e2e_curation" ->
      """WITH gated AS (
        |  SELECT doc_id, text FROM documents
        |  WHERE n_chars >= 100
        |    AND len(string_split(text, ' ')) >= 20
        |    AND list_contains(string_split(text, ' '), 'the')),
        |kept AS (SELECT min(doc_id) AS doc_id FROM gated GROUP BY md5(text)),
        |sc AS (
        |  SELECT g.doc_id, len(l) AS ntok,
        |         len(list_distinct(l))::DOUBLE / len(l) AS score
        |  FROM (SELECT doc_id, string_split(text, ' ') AS l FROM gated) g
        |  JOIN kept USING (doc_id)),
        |b AS (SELECT CAST(sum(ntok) // 2 AS BIGINT) AS budget FROM sc),
        |c AS (SELECT doc_id, score, ntok,
        |             CAST(sum(ntok) OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS cum_tok
        |      FROM sc)
        |SELECT doc_id, score, ntok, cum_tok
        |FROM c, b WHERE cum_tok <= budget
        |ORDER BY score DESC, doc_id""".stripMargin,
    "dedup_boilerplate" ->
      """WITH s AS (
        |  SELECT doc_id, array_to_string(l[start:start+3], ' ') AS span
        |  FROM (SELECT doc_id, string_split(text, ' ') AS l,
        |               unnest(generate_series(1,
        |                 greatest(len(string_split(text, ' ')) - 3, 1), 4)) AS start
        |        FROM documents)),
        |f AS (SELECT span, count(DISTINCT doc_id) AS nd FROM s GROUP BY span),
        |p AS (SELECT s.doc_id, count(*) AS n_spans,
        |             count(*) FILTER (f.nd >= 2) AS n_boiler
        |      FROM s JOIN f USING (span) GROUP BY s.doc_id)
        |SELECT doc_id, n_spans, n_boiler, n_boiler * 5 < n_spans AS keep
        |FROM p ORDER BY doc_id""".stripMargin,
    "text_perplexity" ->
      """WITH t AS (
        |  SELECT doc_id,
        |         unnest(list_zip(l[1:greatest(len(l)-2, 0)], l[2:len(l)-1], l[3:len(l)])) AS g
        |  FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents)),
        |d AS (SELECT doc_id, g[1] AS w1, g[2] AS w2, g[3] AS w3 FROM t),
        |m AS (SELECT w1, w2, w3, count(*) AS cnt,
        |             sum(count(*)) OVER (PARTITION BY w1, w2) AS total
        |      FROM d GROUP BY 1, 2, 3)
        |SELECT d.doc_id, count(*) AS n_tri,
        |       round(avg(ln(m.cnt::DOUBLE / m.total)), 6) AS avg_logp,
        |       round(avg(ln(m.cnt::DOUBLE / m.total)), 6) > -4.0 AS flag_keep
        |FROM d JOIN m USING (w1, w2, w3)
        |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin,
    "text_vocab_coverage" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |v AS (SELECT tok FROM (
        |        SELECT tok, row_number() OVER (ORDER BY count(*) DESC, tok) AS rk
        |        FROM toks GROUP BY tok) WHERE rk <= 20)
        |SELECT t.doc_id, count(*) AS n_tok,
        |       CAST(count(*) FILTER (v.tok IS NULL) AS BIGINT) AS n_oov,
        |       (count(*) FILTER (v.tok IS NULL))::DOUBLE / count(*) AS oov_frac
        |FROM toks t LEFT JOIN v ON t.tok = v.tok
        |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin,
    "pipeline_token_budget" ->
      """WITH d AS (
        |  SELECT doc_id, len(l) AS ntok,
        |         len(list_distinct(l))::DOUBLE / len(l) AS score
        |  FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents)),
        |b AS (SELECT CAST(sum(ntok) // 4 AS BIGINT) AS budget FROM d),
        |c AS (SELECT doc_id, score, ntok,
        |             CAST(sum(ntok) OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS cum_tok
        |      FROM d)
        |SELECT doc_id, score, ntok, cum_tok
        |FROM c, b WHERE cum_tok <= budget
        |ORDER BY score DESC, doc_id""".stripMargin,
    "dedup_semantic" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |           FROM embeddings),
        |cents AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
        |asg AS (SELECT e.vec_id, e.v,
        |               (SELECT c.cid FROM cents c
        |                ORDER BY CAST(round(list_cosine_similarity(e.v, c.cv)
        |                              * 1000000) AS BIGINT) DESC, c.cid
        |                LIMIT 1) AS cell
        |        FROM e)
        |SELECT a.cell, a.vec_id AS va, b.vec_id AS vb,
        |       CAST(round(list_cosine_similarity(a.v, b.v) * 1000000)
        |            AS BIGINT) AS sim_e6
        |FROM asg a JOIN asg b ON a.cell = b.cell AND a.vec_id < b.vec_id
        |WHERE CAST(round(list_cosine_similarity(a.v, b.v) * 1000000)
        |           AS BIGINT) > 400000
        |ORDER BY va, vb""".stripMargin,
    "q_observe" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |       round(sum(l_quantity), 2) AS sum_qty,
        |       max(l_quantity) AS max_qty
        |FROM lineitem WHERE l_discount > 0.05""".stripMargin,
    "q_repartition_sort" ->
      """SELECT l_returnflag, count(*) AS n,
        |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
        |         AS sum_price_c
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin
  )
}
