package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus/model insight reports — the tenth widening batch: the per-source
  * dataset card (the datasheet a corpus release ships with), curriculum
  * phase assignment by score quantiles, probability-calibration bins
  * (reliability diagram), matryoshka-embedding truncation agreement, and
  * common-neighbor (Jaccard) link prediction.
  *
  * All five follow the repo determinism discipline: integer aggregates
  * CAST to BIGINT, libm-adjacent doubles micro-rounded before any
  * engine-visible compare, argmax ties broken on ids.
  */
object InsightQueries {

  private def docsWithTok(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("ntok", size(split(col("text"), " ")))

  // ------------------------------------------------------------ dataset card

  /** Per-source dataset card: document/char/token totals, language
    * diversity, top language (mode, ties to smallest code), and the
    * exact-duplicate exposure (docs whose full text occurs ≥2 times
    * anywhere in the corpus) — the one-scan datasheet that rides along
    * every corpus release.
    *
    * Scale: duplicate exposure uses a window over the text partition (one
    * shuffle keyed on text; at 100 TB key on a 128-bit digest — same
    * plan); everything else is per-source aggregation plus a
    * 20-row top-language broadcast join back.
    */
  def datasetCard(s: SparkSession, d: String): DataFrame = {
    val docs = docsWithTok(s, d)
    val wd = Window.partitionBy("text")
    val d2 = docs.withColumn("tcnt", count(lit(1)).over(wd))
    val perSrc = d2.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      sum(col("n_chars")).as("total_chars"),
      sum(col("ntok")).as("total_tokens"),
      countDistinct(col("lang")).as("n_langs"),
      sum(when(col("tcnt") > 1, 1L).otherwise(0L)).as("dup_docs"))
    val wl = Window.partitionBy("source")
      .orderBy(col("lang_docs").desc, col("lang"))
    val topLang = docs.groupBy("source", "lang")
      .agg(count(lit(1)).as("lang_docs"))
      .withColumn("rn", row_number().over(wl)).filter(col("rn") === 1)
      .select(col("source"), col("lang").as("top_lang"),
        col("lang_docs").as("top_lang_docs"))
    perSrc.join(broadcast(topLang), "source")
      .withColumn("pct_dup", round(col("dup_docs") / col("n_docs"), 6))
      .select("source", "n_docs", "total_chars", "total_tokens", "n_langs",
        "top_lang", "top_lang_docs", "dup_docs", "pct_dup")
      .orderBy("source")
  }

  // ------------------------------------------------------------- curriculum

  /** Curriculum phase assignment: documents split into 3 training phases
    * by exact score terciles (score = distinct-token ratio, the
    * pipeline_token_budget diversity proxy; phase 1 = cleanest). Phase
    * boundaries are exact interpolated quantiles computed once and
    * broadcast — NOT a global ntile sort, so the plan has no
    * single-partition window and survives any corpus size. Per-phase
    * doc/token totals ride along via a 3-row broadcast join.
    */
  def curriculum(s: SparkSession, d: String): DataFrame = {
    val base = docsWithTok(s, d)
      .withColumn("ndis", size(array_distinct(split(col("text"), " "))))
      .withColumn("score", col("ndis") / col("ntok"))
      .select("doc_id", "score", "ntok")
    val qs = base.agg(
      percentile(col("score"), lit(1.0 / 3)).as("p33"),
      percentile(col("score"), lit(2.0 / 3)).as("p66"))
    val assigned = base.crossJoin(broadcast(qs))
      .withColumn("phase",
        when(col("score") >= col("p66"), 1L)
          .when(col("score") >= col("p33"), 2L).otherwise(3L))
    val stats = assigned.groupBy("phase").agg(
      count(lit(1)).as("phase_docs"), sum(col("ntok")).as("phase_tokens"))
    assigned.join(broadcast(stats), "phase")
      .select("doc_id", "score", "ntok", "phase", "phase_docs", "phase_tokens")
      .orderBy("doc_id")
  }

  // ------------------------------------------------------- calibration bins

  /** Probability-calibration (reliability-diagram) bins for a fixed
    * logistic scorer over lineitem: predicted P(returnflag = R) from a
    * constant weight vector, binned by predicted probability, with
    * per-bin mean prediction vs empirical positive rate and the
    * calibration gap. Sigmoid outputs are micro-rounded to BIGINT before
    * binning or summing (the ml_logreg_step fixed-point discipline), so
    * bin membership and averages are integer-exact across engines.
    *
    * Scale: one scan, a ≤10-key aggregate with map-side combine — the
    * shape calibration monitoring keeps at any volume.
    */
  def calibrationBins(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d).select(
      col("l_discount").as("x1"), col("l_tax").as("x2"),
      when(col("l_returnflag") === "R", 1L).otherwise(0L).as("y"))
    val z = lit(-1.0) + lit(20.0) * col("x1") - lit(15.0) * col("x2")
    val p = lit(1.0) / (lit(1.0) + exp(-z))
    li.withColumn("p_micro", round(p * 1e6).cast("long"))
      .withColumn("bin", floor(col("p_micro") / lit(100000)).cast("long"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum(col("y")).as("pos"),
        sum(col("p_micro")).as("sum_p_micro"))
      .withColumn("avg_p", round(col("sum_p_micro") / col("n") / lit(1000000.0), 6))
      .withColumn("frac_pos", round(col("pos") / col("n"), 6))
      .withColumn("gap",
        round(abs(col("sum_p_micro") / col("n") / lit(1000000.0)
          - col("pos") / col("n")), 6))
      .select("bin", "n", "pos", "sum_p_micro", "avg_p", "frac_pos", "gap")
      .orderBy("bin")
  }

  /** Isotonic regression by pool-adjacent-violators over the calibration
    * bins — the standard probability-calibration step downstream of
    * `ml_calibration_bins` (same score, same binning). PAV runs DRIVER-
    * side on the decision-sized bin table (<=11 rows — the aggregate is
    * the distributed part; pooling a dozen blocks is not), emitting each
    * bin's pooled monotone rate as the exact BIGINT-sum division of its
    * block. The ORACLE is a different algorithm entirely: the minimax
    * closed form iso(i) = max_{j<=i} min_{k>=i} rate(j..k) expressed as
    * three self-joins over the bin spans — two independent derivations
    * agreeing bit-exactly (double rounding of rationals is monotone, so
    * the minimax double equals the pooled-block double). */
  def isotonicPav(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d).select(
      col("l_discount").as("x1"), col("l_tax").as("x2"),
      when(col("l_returnflag") === "R", 1L).otherwise(0L).as("y"))
    val z = lit(-1.0) + lit(20.0) * col("x1") - lit(15.0) * col("x2")
    val p = lit(1.0) / (lit(1.0) + exp(-z))
    val bins = li
      .withColumn("bin",
        floor(round(p * 1e6).cast("long") / lit(100000)).cast("long"))
      .groupBy("bin").agg(count(lit(1)).as("n"), sum(col("y")).as("pos"))
      .collect()
      .map(r => (r.getAs[Long]("bin"), r.getAs[Long]("n"), r.getAs[Long]("pos")))
      .sortBy(_._1)
    final case class Block(bins: List[(Long, Long, Long)], n: Long, pos: Long) {
      def rate: Double = pos.toDouble / n.toDouble
    }
    val pooled = bins.foldLeft(List.empty[Block]) { (acc, b) =>
      var st = Block(List(b), b._2, b._3) :: acc
      while (st.lengthCompare(2) >= 0 && st.head.rate < st.tail.head.rate) {
        val merged = Block(st.tail.head.bins ::: st.head.bins,
          st.head.n + st.tail.head.n, st.head.pos + st.tail.head.pos)
        st = merged :: st.tail.tail
      }
      st
    }.reverse
    val rows = pooled.flatMap { blk =>
      blk.bins.map { case (bin, n, pos) =>
        (bin, n, pos, pos.toDouble / n.toDouble, blk.rate)
      }
    }
    import s.implicits._
    rows.toDF("bin", "n", "pos", "raw_rate", "iso_rate").orderBy("bin")
  }

  // ------------------------------------------------------------- matryoshka

  /** Matryoshka truncation check: for each query vector, does the top-1
    * cosine neighbor under the FIRST 16 of 64 dimensions agree with the
    * full-dimension top-1? The go/no-go readout before serving truncated
    * (4× cheaper) embeddings. Same broadcast-query × corpus-stream shape
    * as sim_cosine_topk, with both similarities fused per row; ties break
    * on vec_id.
    */
  def matryoshkaAgree(s: SparkSession, d: String): DataFrame = {
    import graft.plans.CosineSimilarity.cosine_sim
    val base = Tables.embeddings(s, d)
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("v"))
    val q = base.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val sims = base.join(broadcast(q), col("vec_id") =!= col("qid"))
      .withColumn("sim_full", cosine_sim(col("v"), col("qv")))
      .withColumn("sim_pre",
        cosine_sim(slice(col("v"), 1, 16), slice(col("qv"), 1, 16)))
    val wF = Window.partitionBy("qid").orderBy(col("sim_full").desc, col("vec_id"))
    val wP = Window.partitionBy("qid").orderBy(col("sim_pre").desc, col("vec_id"))
    val topF = sims.withColumn("rn", row_number().over(wF)).filter(col("rn") === 1)
      .select(col("qid"), col("vec_id").as("top_full"), col("sim_full"))
    val topP = sims.withColumn("rn", row_number().over(wP)).filter(col("rn") === 1)
      .select(col("qid"), col("vec_id").as("top_pre"), col("sim_pre"))
    topF.join(broadcast(topP), "qid")
      .withColumn("agree", (col("top_full") === col("top_pre")).cast("int"))
      .select("qid", "top_full", "sim_full", "top_pre", "sim_pre", "agree")
      .orderBy("qid")
  }

  // ------------------------------------------------------- link prediction

  /** Common-neighbor link prediction with Jaccard scoring over the
    * part↔supplier graph: candidate pairs are generated from per-vertex
    * sorted adjacency lists via the shared BucketPairs in-array idiom
    * (never a |E|×|E| self-join; fan-out bounded by neighbor-list length
    * squared), scored |N(a)∩N(b)| / |N(a)∪N(b)|, already-adjacent pairs
    * anti-joined away, top-100 by (jaccard, common, pair) through one
    * TakeOrderedAndProject.
    */
  def jaccardLinks(s: SparkSession, d: String, k: Int = 100): DataFrame = {
    val e = GraphQueries.edges(s, d)
    val nbrs = e.groupBy("u").agg(sort_array(collect_set(col("v"))).as("nb"))
    val deg = e.groupBy("u").agg(count(lit(1)).as("deg"))
    val common = BucketPairs.pairs(nbrs, "nb", "a", "b")
      .groupBy("a", "b").agg(count(lit(1)).as("common"))
    common
      .join(e, col("a") === col("u") && col("b") === col("v"), "left_anti")
      .join(deg.select(col("u").as("a"), col("deg").as("deg_a")), "a")
      .join(deg.select(col("u").as("b"), col("deg").as("deg_b")), "b")
      .withColumn("jaccard",
        round(col("common") / (col("deg_a") + col("deg_b") - col("common")), 6))
      .select("a", "b", "common", "deg_a", "deg_b", "jaccard")
      .orderBy(col("jaccard").desc, col("a"), col("b"))
      .limit(k)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipeline_dataset_card" -> (datasetCard(_, _)),
    "pipeline_curriculum" -> (curriculum(_, _)),
    "ml_calibration_bins" -> (calibrationBins(_, _)),
    "ml_isotonic_pav" -> (isotonicPav(_, _)),
    "sim_matryoshka" -> (matryoshkaAgree(_, _)),
    "graph_jaccard_links" -> (jaccardLinks(_, _))
  )

  val oracles: Map[String, String] = Map(
    "pipeline_dataset_card" ->
      """WITH d AS (
        |  SELECT *, len(string_split(text, ' ')) AS ntok,
        |         count(*) OVER (PARTITION BY text) AS tcnt
        |  FROM documents),
        |per_src AS (
        |  SELECT source,
        |         CAST(count(*) AS BIGINT) AS n_docs,
        |         CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |         CAST(sum(ntok) AS BIGINT) AS total_tokens,
        |         CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
        |         CAST(sum(CASE WHEN tcnt > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |           AS dup_docs
        |  FROM d GROUP BY source),
        |top_lang AS (
        |  SELECT source, lang AS top_lang,
        |         CAST(lang_docs AS BIGINT) AS top_lang_docs
        |  FROM (SELECT source, lang, count(*) AS lang_docs,
        |               row_number() OVER (PARTITION BY source
        |                   ORDER BY count(*) DESC, lang) AS rn
        |        FROM documents GROUP BY source, lang)
        |  WHERE rn = 1)
        |SELECT source, n_docs, total_chars, total_tokens, n_langs,
        |       top_lang, top_lang_docs, dup_docs,
        |       round(dup_docs / n_docs, 6) AS pct_dup
        |FROM per_src JOIN top_lang USING (source)
        |ORDER BY source""".stripMargin,
    "pipeline_curriculum" ->
      """WITH base AS (
        |  SELECT doc_id,
        |         len(list_distinct(string_split(text, ' ')))
        |           / len(string_split(text, ' ')) AS score,
        |         len(string_split(text, ' ')) AS ntok
        |  FROM documents),
        |qs AS (SELECT quantile_cont(score, 1.0/3) AS p33,
        |              quantile_cont(score, 2.0/3) AS p66 FROM base),
        |assigned AS (
        |  SELECT doc_id, score, ntok,
        |         CASE WHEN score >= p66 THEN 1
        |              WHEN score >= p33 THEN 2 ELSE 3 END AS phase
        |  FROM base CROSS JOIN qs),
        |stats AS (SELECT phase, CAST(count(*) AS BIGINT) AS phase_docs,
        |                 CAST(sum(ntok) AS BIGINT) AS phase_tokens
        |          FROM assigned GROUP BY phase)
        |SELECT doc_id, score, CAST(ntok AS INT) AS ntok,
        |       CAST(phase AS BIGINT) AS phase, phase_docs, phase_tokens
        |FROM assigned JOIN stats USING (phase)
        |ORDER BY doc_id""".stripMargin,
    "ml_isotonic_pav" ->
      """WITH li AS (
        |  SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y,
        |         CAST(round((1.0 / (1.0 + exp(-(-1.0 + 20.0 * l_discount
        |           - 15.0 * l_tax)))) * 1e6) AS BIGINT) AS p_micro
        |  FROM lineitem),
        |bins AS (
        |  SELECT CAST(floor(p_micro / 100000) AS BIGINT) AS bin,
        |         CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(y) AS BIGINT) AS pos
        |  FROM li GROUP BY 1),
        |spans AS (
        |  SELECT a.bin AS j, b.bin AS k,
        |         CAST(sum(c.pos) AS DOUBLE) / CAST(sum(c.n) AS DOUBLE)
        |           AS rate
        |  FROM bins a JOIN bins b ON a.bin <= b.bin
        |  JOIN bins c ON c.bin BETWEEN a.bin AND b.bin
        |  GROUP BY a.bin, b.bin),
        |minr AS (
        |  SELECT s.j, i.bin AS i, min(s.rate) AS mr
        |  FROM spans s JOIN bins i ON s.j <= i.bin AND s.k >= i.bin
        |  GROUP BY s.j, i.bin),
        |iso AS (SELECT i, max(mr) AS iso_rate FROM minr GROUP BY i)
        |SELECT b.bin, b.n, b.pos,
        |       CAST(b.pos AS DOUBLE) / CAST(b.n AS DOUBLE) AS raw_rate,
        |       iso.iso_rate
        |FROM bins b JOIN iso ON iso.i = b.bin ORDER BY b.bin""".stripMargin,
    "ml_calibration_bins" ->
      """WITH li AS (
        |  SELECT l_discount AS x1, l_tax AS x2,
        |         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y,
        |         CAST(round((1.0 / (1.0 + exp(-(-1.0 + 20.0 * l_discount
        |           - 15.0 * l_tax)))) * 1e6) AS BIGINT) AS p_micro
        |  FROM lineitem)
        |SELECT CAST(floor(p_micro / 100000) AS BIGINT) AS bin,
        |       CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(y) AS BIGINT) AS pos,
        |       CAST(sum(p_micro) AS BIGINT) AS sum_p_micro,
        |       round(sum(p_micro) / count(*) / 1000000.0, 6) AS avg_p,
        |       round(sum(y) / count(*), 6) AS frac_pos,
        |       round(abs(sum(p_micro) / count(*) / 1000000.0
        |             - sum(y) / count(*)), 6) AS gap
        |FROM li GROUP BY 1 ORDER BY bin""".stripMargin,
    "sim_matryoshka" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |           FROM embeddings),
        |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 10),
        |sims AS (
        |  SELECT qid, vec_id,
        |         list_cosine_similarity(v, qv) AS sim_full,
        |         list_cosine_similarity(v[1:16], qv[1:16]) AS sim_pre
        |  FROM e JOIN q ON vec_id <> qid),
        |tf AS (SELECT qid, vec_id AS top_full, sim_full FROM (
        |         SELECT *, row_number() OVER (PARTITION BY qid
        |             ORDER BY sim_full DESC, vec_id) AS rn FROM sims)
        |       WHERE rn = 1),
        |tp AS (SELECT qid, vec_id AS top_pre, sim_pre FROM (
        |         SELECT *, row_number() OVER (PARTITION BY qid
        |             ORDER BY sim_pre DESC, vec_id) AS rn FROM sims)
        |       WHERE rn = 1)
        |SELECT qid, top_full, sim_full, top_pre, sim_pre,
        |       CAST(top_full = top_pre AS INT) AS agree
        |FROM tf JOIN tp USING (qid) ORDER BY qid""".stripMargin,
    "graph_jaccard_links" ->
      s"""WITH e AS (
         |  ${GraphQueries.undirectedSql}
         |),
         |deg AS (SELECT u, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY u),
         |common AS (
         |  SELECT e1.v AS a, e2.v AS b, CAST(count(*) AS BIGINT) AS common
         |  FROM e e1 JOIN e e2 ON e1.u = e2.u AND e1.v < e2.v
         |  GROUP BY 1, 2),
         |cand AS (
         |  SELECT a, b, common FROM common c
         |  WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.u = c.a AND e.v = c.b))
         |SELECT a, b, common, da.deg AS deg_a, db.deg AS deg_b,
         |       round(common / (da.deg + db.deg - common), 6) AS jaccard
         |FROM cand
         |JOIN deg da ON da.u = a
         |JOIN deg db ON db.u = b
         |ORDER BY jaccard DESC, a, b LIMIT 100""".stripMargin
  )
}
