package graft.queries

import graft.Tables
import graft.functions.TextFunctions._
import graft.plans.Fnv1a64
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-3 training-data-pipeline operators: context-window chunking,
  * sequence packing, inverted-index construction, exact-substring near-dup
  * detection, int8 embedding quantization, PII-style redaction, corpus
  * capping, plus two statistics surfaces (crosstab contingency tables and
  * higher central moments).
  *
  * Scale notes per operator live on each method; the common theme is that
  * every shape is one explode/aggregate pass or a bucket-join — nothing
  * quadratic in the corpus, no driver-side loops.
  */
object CorpusQueries {

  /** Fixed-size token chunking with stride overlap (window 32, stride 24 →
    * 8-token overlap) — the chunking pass feeding RAG indexing and
    * fixed-context training. One explode per doc (ntok/stride chunks);
    * chunk text never leaves the row (fingerprinted in place), so shuffle
    * rows stay small. At 100 TB this runs map-side only + the output sort.
    */
  def chunkOverlap(s: SparkSession, d: String, window: Int = 32,
      stride: Int = 24): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), spaceTokens(col("text")).as("toks"))
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(1), greatest(size(col("toks")), lit(1)),
          lit(stride))).as("start"))
      .select(col("doc_id"),
        expr(s"(start - 1) div $stride").as("chunk_idx"),
        slice(col("toks"), col("start"), lit(window)).as("chunk"))
      .select(col("doc_id"), col("chunk_idx"),
        size(col("chunk")).cast("long").as("n_tokens"),
        md5(array_join(col("chunk"), " ").cast("binary")).as("chunk_fp"))
      .orderBy("doc_id", "chunk_idx")

  /** Greedy next-fit sequence packing: documents (in doc_id order) packed
    * into ≤256-token bins, independently per shard — the batch-construction
    * step of training-data prep. Packing is inherently serial, so the
    * distributed form packs WITHIN shards (each shard's fold is a few
    * hundred docs) and shards pack in parallel — exactly how a 1000-executor
    * run would batch 100 TB. The per-shard fold is a single `aggregate`
    * higher-order function over the sorted (doc_id, ntok) list; bins may
    * start at 1 when a shard's first doc alone exceeds the budget (the fold
    * opens a fresh bin), matching the oracle's recursive CTE exactly.
    */
  def packSequences(s: SparkSession, d: String, budget: Int = 256,
      shards: Int = 8): DataFrame = {
    val perShard = Tables.documents(s, d)
      .select((col("doc_id") % shards).as("shard"), col("doc_id"),
        size(spaceTokens(col("text"))).as("ntok"))
      .groupBy("shard")
      .agg(sort_array(collect_list(struct(col("doc_id"), col("ntok")))).as("docs"))
    val zero = struct(lit(0).as("cum"), lit(0).as("bin"),
      array().cast("array<struct<doc_id:bigint,bin:int,ntok:int>>").as("out"))
    val packed = perShard.select(col("shard"),
      aggregate(col("docs"), zero,
        (acc: Column, x: Column) => {
          val over = acc.getField("cum") + x.getField("ntok") > lit(budget)
          val bin = when(over, acc.getField("bin") + 1).otherwise(acc.getField("bin"))
          val cum = when(over, x.getField("ntok"))
            .otherwise(acc.getField("cum") + x.getField("ntok"))
          struct(cum.as("cum"), bin.as("bin"),
            concat(acc.getField("out"), array(struct(
              x.getField("doc_id").as("doc_id"), bin.as("bin"),
              x.getField("ntok").as("ntok")))).as("out"))
        },
        acc => acc.getField("out")).as("out"))
    packed.select(col("shard"), explode(col("out")).as("p"))
      .select(col("shard"), col("p.doc_id").as("doc_id"),
        col("p.bin").cast("long").as("bin_id"), col("p.ntok").cast("long").as("n_tokens"))
      .orderBy("shard", "doc_id")
  }

  /** Inverted index construction: token → document frequency + the first 20
    * postings (sorted doc ids, comma-joined — the driver gate hashes scalar
    * cells, so the list is serialized). The search-index build pass: one
    * explode + one token-keyed shuffle; posting lists cap at 20 so no
    * hot-token row grows unbounded (at 100 TB you'd also bucket postings by
    * range — documented, not needed at this row width).
    */
  def invertedIndex(s: SparkSession, d: String, maxPostings: Int = 20): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        explode(array_distinct(spaceTokens(col("text")))).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy("tok")
      .agg(count(lit(1)).as("df"),
        array_join(
          transform(slice(sort_array(collect_list(col("doc_id"))), 1, maxPostings),
            x => x.cast("string")), ",").as("postings"))
      .filter(col("df") >= 2)
      .orderBy("tok")

  /** Exact-substring near-dup detection (the char-gram form of exact
    * substring dedup): docs sharing ≥2 distinct 24-char grams sampled at
    * stride 2 (geometry chosen so the answer is non-empty at every test
    * SF). Grams bucket by value (the LSH no-self-join shape: per-gram
    * sorted doc lists → intra-bucket pairs), so the join is O(docs × grams),
    * never O(docs²). Bounded universe doc_id < 300 keeps the oracle's
    * self-join cheap; the Spark side's bucket shape is the 100 TB plan.
    */
  def substringPairs(s: SparkSession, d: String, gramLen: Int = 24,
      stride: Int = 2, maxDocId: Long = 300L, minShared: Long = 2L): DataFrame = {
    // gram generation via the native CharGrams Generator (one fused pass;
    // no start-index array, no Generate→Project round trip)
    val grams = Tables.documents(s, d)
      .filter(col("doc_id") < maxDocId)
      .select(col("doc_id"),
        graft.plans.CharGrams.charGrams(col("text"), gramLen, stride).as("gram"))
    val buckets = grams.groupBy("gram")
      .agg(sort_array(collect_set(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) > 1)
    BucketPairs.pairs(buckets, "ids", "da", "db")
      .groupBy("da", "db").agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .orderBy("da", "db")
  }

  /** Symmetric int8 scalar quantization of the embedding column — the
    * storage/bandwidth op of a 100 TB vector store (4× smaller than fp32,
    * 8× than fp64). Per vector: scale = 127/max|x|, q = round(x·scale),
    * L2 reconstruction error and saturation count. All math is elementwise
    * double IEEE (bit-identical across engines); only the two float outputs
    * are rounded. Linear single-pass, no shuffle except the output sort.
    */
  def quantizeInt8(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("v"))
      .withColumn("amax", array_max(transform(col("v"), x => abs(x))))
      .filter(col("amax") > 0)
      .withColumn("scale", lit(127.0) / col("amax"))
      .withColumn("q", transform(col("v"),
        x => round(x * col("scale"), 0).cast("long")))
      .select(col("vec_id"),
        round(col("scale"), 6).as("scale_r"),
        round(sqrt(aggregate(
          zip_with(col("v"), col("q"),
            (x, qq) => (x - qq / col("scale")) * (x - qq / col("scale"))),
          lit(0.0d), (a, b) => a + b)), 6).as("l2_err"),
        size(filter(col("q"), qq => abs(qq) === 127)).cast("long").as("n_sat"))
      .orderBy("vec_id")

  /** PII-style redaction: the scrubbing pass every training corpus runs.
    * The fixture corpus carries no natural PII, so the query SYNTHESIZES a
    * deterministic contact line per doc (email + numeric ref derived from
    * doc_id) and then redacts it — the redaction logic is the operator
    * under test; the synthesis makes it non-vacuous on this corpus. Counts
    * and removed-char totals per source. Regex stays in the RE2 ∩ Java
    * common dialect (char classes + bounded repeats, no backrefs).
    */
  def redact(s: SparkSession, d: String): DataFrame = {
    val emailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val numPat = "[0-9]+"
    val aug = concat(col("text"), lit(" contact user"), col("doc_id"),
      lit("@example.com ref "), col("doc_id") * 7)
    Tables.documents(s, d)
      .withColumn("aug", aug)
      .withColumn("n_emails",
        size(regexp_extract_all(col("aug"), lit(emailPat), lit(0))).cast("long"))
      .withColumn("pass1", regexp_replace(col("aug"), emailPat, "<EMAIL>"))
      .withColumn("n_nums",
        size(regexp_extract_all(col("pass1"), lit(numPat), lit(0))).cast("long"))
      .withColumn("clean", regexp_replace(col("pass1"), numPat, "<NUM>"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("n_emails").as("emails_redacted"),
        sum("n_nums").as("nums_redacted"),
        sum(length(col("aug")) - length(col("clean"))).as("chars_removed"))
      .orderBy("source")
  }

  /** Corpus capping: each source downsampled to ~15 docs via a
    * DATA-DERIVED deterministic hash rate (thresh = 15·10000 ÷ source
    * count) — the per-source budget knob of corpus mixing, with the same
    * engine/partition-independent reproducibility contract as
    * q_sample_hash. Rates come from a scalar-subquery-style broadcast of
    * the per-source counts (integer arithmetic end to end: no float rate
    * can drift the boundary row).
    */
  def capSources(s: SparkSession, d: String, cap: Int = 15): DataFrame = {
    val docs = Tables.documents(s, d)
    val counts = docs.groupBy("source").agg(count(lit(1)).as("n_before"))
      .withColumn("thresh", expr(s"($cap * 10000) div n_before"))
    docs.join(broadcast(counts), "source")
      .filter(Fnv1a64.ihash31(col("doc_id").cast("string")) % 10000 < col("thresh"))
      .groupBy("source")
      .agg(max("n_before").as("n_before"), max("thresh").as("thresh"),
        count(lit(1)).as("n_sampled"))
      .orderBy("source")
  }

  /** Contingency table via DataFrameStatFunctions.crosstab — the pairwise
    * categorical profiling surface. Output columns are the value labels
    * (driver compares columns sorted by name, so labels align with the
    * oracle's quoted aliases).
    */
  def crosstab(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).stat.crosstab("o_orderstatus", "o_orderpriority")
      .orderBy("o_orderstatus_o_orderpriority")

  /** Higher central moments per group: the builtin `skewness` (population
    * g1) and `kurtosis` (excess g2) aggregates, oracled against the
    * two-pass power-sum formulas. Rounded 6dp: one-pass streaming central
    * moments vs two-pass SQL agree to ~1e-13 relative on these magnitudes.
    */
  def moments(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        round(skewness(col("l_quantity")), 6).as("skew"),
        round(kurtosis(col("l_quantity")), 6).as("kurt"))
      .orderBy("l_returnflag")

  /** Trigram language-model statistics: the most likely next token per
    * 2-token context (count ≥ 20 contexts), with exact conditional
    * probability — the corpus-LM profiling pass. Explode + one
    * context-keyed shuffle + one window pass; vocabulary-bounded keys.
    * p = cnt/total is a BIGINT÷BIGINT double division — bit-exact across
    * engines, no rounding needed.
    */
  def trigramLm(s: SparkSession, d: String, minTotal: Long = 20L): DataFrame = {
    // shared trigram builder (TextFunctions.trigrams) — one definition for
    // both trigram surfaces (LM statistics here, perplexity scoring)
    val tri = trigrams(spaceTokens(col("text")))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("w1", "w2")
    Tables.documents(s, d)
      .select(explode(tri).as("g"))
      .select(col("g.w1").as("w1"), col("g.w2").as("w2"), col("g.w3").as("w3"))
      .groupBy("w1", "w2", "w3").agg(count(lit(1)).as("cnt"))
      .withColumn("total", sum("cnt").over(w))
      .withColumn("rk", row_number().over(
        w.orderBy(col("cnt").desc, col("w3").asc)))
      .filter(col("rk") === 1 && col("total") >= minTotal)
      .select(col("w1"), col("w2"), col("w3"), col("cnt"), col("total"),
        (col("cnt") / col("total")).as("p"))
      .orderBy("w1", "w2")
  }

  /** DataFrameNaFunctions surface (`na.fill` / `na.replace`): nulls are
    * synthesized deterministically (the fixture is clean by design), then
    * filled and recoded through the na API — the missing-data hygiene pass.
    * Oracle expresses the same semantics as COALESCE/CASE.
    */
  def naFill(s: SparkSession, d: String): DataFrame = {
    val withNulls = Tables.lineitem(s, d)
      .select(
        when(col("l_returnflag") === "N", null).otherwise(col("l_returnflag"))
          .as("flag"),
        when(col("l_discount") < 0.02, null).otherwise(col("l_discount"))
          .as("disc"))
    withNulls.na.fill(Map("flag" -> "UNK", "disc" -> 0.0))
      .na.replace("flag", Map("R" -> "RETURNED"))
      .groupBy("flag")
      .agg(count(lit(1)).as("n"), round(sum("disc"), 2).as("sum_disc"))
      .orderBy("flag")
  }

  /** Word-association mining: top-20 PPMI pairs over within-document
    * co-occurrence — the statistic under classic word embeddings (PPMI
    * matrix factorization). Pairs generate from per-doc sorted DISTINCT
    * word lists via BucketPairs (fan-out = per-doc vocab², never a corpus
    * self-join); the PMI log's argument is an exact integer ratio, so
    * ranking order is engine-stable. Floor of 5 co-occurrences kills the
    * noise tail exactly like real PPMI pipelines.
    */
  def cooccurrencePmi(s: SparkSession, d: String, minCooc: Long = 5,
      k: Int = 20): DataFrame = {
    val docs = Tables.documents(s, d)
    val words = docs.select(col("doc_id"),
      array_sort(array_distinct(spaceTokens(col("text")))).as("ws"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val df = words.select(explode(col("ws")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("df"))
    val cooc = BucketPairs.pairs(words, "ws", "w_a", "w_b")
      .groupBy("w_a", "w_b").agg(count(lit(1)).as("cooc"))
      .filter(col("cooc") >= minCooc)
    cooc
      .join(broadcast(df.select(col("w").as("w_a"), col("df").as("df_a"))), "w_a")
      .join(broadcast(df.select(col("w").as("w_b"), col("df").as("df_b"))), "w_b")
      .crossJoin(broadcast(nDocs))
      .withColumn("pmi",
        round(log((col("cooc") * col("n_docs")) / (col("df_a") * col("df_b"))), 6))
      .select("w_a", "w_b", "cooc", "df_a", "df_b", "pmi")
      .orderBy(col("pmi").desc, col("w_a"), col("w_b"))
      .limit(k)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_cooc_pmi" -> (cooccurrencePmi(_, _)),
    "text_trigram_lm" -> (trigramLm(_, _)),
    "q_na_fill" -> (naFill(_, _)),
    "text_chunk_overlap" -> (chunkOverlap(_, _)),
    "pipeline_pack_sequences" -> (packSequences(_, _)),
    "text_inverted_index" -> (invertedIndex(_, _)),
    "dedup_substring" -> (substringPairs(_, _)),
    "emb_quantize_int8" -> (quantizeInt8(_, _)),
    "text_redact" -> (redact(_, _)),
    "pipeline_cap_sources" -> (capSources(_, _)),
    "q_crosstab" -> (crosstab(_, _)),
    "q_moments" -> (moments(_, _))
  )

  /** FNV-1a 64 of a string as a DuckDB HUGEINT fold, masked to 31 bits —
    * the q_sample_hash technique. */
  /** Shared FNV fold (OracleSql.fnvIhash31) with this module's historical
    * ::BIGINT suffix. */
  private def ihash31Sql(e: String): String =
    s"${OracleSql.fnvIhash31(e)}::BIGINT"

  val oracles: Map[String, String] = Map(
    "text_cooc_pmi" ->
      """WITH ws AS (
        |  SELECT doc_id,
        |         list_sort(list_distinct(string_split(text, ' '))) AS ws
        |  FROM documents),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
        |df AS (SELECT w, CAST(count(*) AS BIGINT) AS df
        |       FROM (SELECT doc_id, unnest(ws) AS w FROM ws) GROUP BY w),
        |pairs AS (
        |  SELECT a.w AS w_a, b.w AS w_b, CAST(count(*) AS BIGINT) AS cooc
        |  FROM (SELECT doc_id, unnest(ws) AS w FROM ws) a
        |  JOIN (SELECT doc_id, unnest(ws) AS w FROM ws) b
        |    ON a.doc_id = b.doc_id AND a.w < b.w
        |  GROUP BY 1, 2 HAVING count(*) >= 5)
        |SELECT w_a, w_b, cooc, da.df AS df_a, db.df AS df_b,
        |       round(ln((cooc * n_docs) / (da.df * db.df)), 6) AS pmi
        |FROM pairs
        |JOIN df da ON da.w = w_a
        |JOIN df db ON db.w = w_b
        |CROSS JOIN n
        |ORDER BY pmi DESC, w_a, w_b LIMIT 20""".stripMargin,
    "text_trigram_lm" ->
      """WITH t AS (
        |  SELECT unnest(list_zip(l[1:greatest(len(l)-2, 0)], l[2:len(l)-1], l[3:len(l)])) AS g
        |  FROM (SELECT string_split(text, ' ') AS l FROM documents)),
        |c AS (SELECT g[1] AS w1, g[2] AS w2, g[3] AS w3, count(*) AS cnt
        |      FROM t GROUP BY 1, 2, 3),
        |r AS (SELECT *, CAST(sum(cnt) OVER (PARTITION BY w1, w2) AS BIGINT) AS total,
        |             row_number() OVER (PARTITION BY w1, w2
        |                                ORDER BY cnt DESC, w3) AS rk
        |      FROM c)
        |SELECT w1, w2, w3, cnt, total, cnt::DOUBLE / total AS p
        |FROM r WHERE rk = 1 AND total >= 20
        |ORDER BY w1, w2""".stripMargin,
    "q_na_fill" ->
      """SELECT CASE WHEN flag = 'R' THEN 'RETURNED' ELSE flag END AS flag,
        |       count(*) AS n, round(sum(disc), 2) AS sum_disc
        |FROM (SELECT coalesce(
        |               CASE WHEN l_returnflag = 'N' THEN NULL
        |                    ELSE l_returnflag END, 'UNK') AS flag,
        |             coalesce(CASE WHEN l_discount < 0.02 THEN NULL
        |                           ELSE l_discount END, 0.0) AS disc
        |      FROM lineitem)
        |GROUP BY 1 ORDER BY flag""".stripMargin,
    "text_chunk_overlap" ->
      """SELECT doc_id, (start - 1) // 24 AS chunk_idx,
        |       len(chunk) AS n_tokens,
        |       md5(array_to_string(chunk, ' ')) AS chunk_fp
        |FROM (
        |  SELECT doc_id, start,
        |         l[start : least(start + 31, len(l))] AS chunk
        |  FROM (SELECT doc_id, string_split(text, ' ') AS l,
        |               unnest(generate_series(1, greatest(len(string_split(text, ' ')), 1), 24)) AS start
        |        FROM documents))
        |ORDER BY doc_id, chunk_idx""".stripMargin,
    "pipeline_pack_sequences" ->
      """WITH RECURSIVE docs AS (
        |  SELECT doc_id % 8 AS shard, doc_id,
        |         len(string_split(text, ' ')) AS ntok,
        |         row_number() OVER (PARTITION BY doc_id % 8 ORDER BY doc_id) AS rn
        |  FROM documents),
        |pack AS (
        |  SELECT shard, rn, doc_id, ntok,
        |         CASE WHEN ntok > 256 THEN 1 ELSE 0 END AS bin,
        |         ntok AS cum
        |  FROM docs WHERE rn = 1
        |  UNION ALL
        |  SELECT d.shard, d.rn, d.doc_id, d.ntok,
        |         CASE WHEN p.cum + d.ntok > 256 THEN p.bin + 1 ELSE p.bin END,
        |         CASE WHEN p.cum + d.ntok > 256 THEN d.ntok ELSE p.cum + d.ntok END
        |  FROM pack p JOIN docs d ON d.shard = p.shard AND d.rn = p.rn + 1)
        |SELECT shard, doc_id, CAST(bin AS BIGINT) AS bin_id,
        |       CAST(ntok AS BIGINT) AS n_tokens
        |FROM pack ORDER BY shard, doc_id""".stripMargin,
    "text_inverted_index" ->
      """SELECT tok, count(*) AS df,
        |       array_to_string(list_sort(list(doc_id))[1:20], ',') AS postings
        |FROM (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
        |      FROM documents)
        |WHERE tok <> ''
        |GROUP BY tok HAVING count(*) >= 2
        |ORDER BY tok""".stripMargin,
    "dedup_substring" ->
      """WITH g AS (
        |  SELECT doc_id, substr(text, start, 24) AS gram
        |  FROM (SELECT doc_id, text,
        |               unnest(generate_series(1, greatest(length(text) - 23, 1), 2)) AS start
        |        FROM documents WHERE doc_id < 300)),
        |dd AS (SELECT DISTINCT doc_id, gram FROM g),
        |pairs AS (
        |  SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS n_shared
        |  FROM dd a JOIN dd b ON a.gram = b.gram AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT da, db, n_shared FROM pairs
        |WHERE n_shared >= 2 ORDER BY da, db""".stripMargin,
    "emb_quantize_int8" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |s AS (SELECT vec_id, v,
        |             127.0 / list_max(list_transform(v, x -> abs(x))) AS scale
        |      FROM e
        |      WHERE list_max(list_transform(v, x -> abs(x))) > 0),
        |q AS (SELECT vec_id, v, scale,
        |             list_transform(v, x -> CAST(round(x * scale) AS BIGINT)) AS qv
        |      FROM s)
        |SELECT vec_id, round(scale, 6) AS scale_r,
        |       round(sqrt(list_reduce(
        |         list_prepend(0.0::DOUBLE,
        |           list_transform(list_zip(v, qv),
        |             p -> (p[1] - p[2] / scale) * (p[1] - p[2] / scale))),
        |         (a, b) -> a + b)), 6) AS l2_err,
        |       len(list_filter(qv, x -> abs(x) = 127)) AS n_sat
        |FROM q ORDER BY vec_id""".stripMargin,
    "text_redact" ->
      """WITH aug AS (
        |  SELECT source,
        |         text || ' contact user' || doc_id || '@example.com ref '
        |              || (doc_id * 7) AS aug
        |  FROM documents),
        |r AS (
        |  SELECT source, aug,
        |         len(regexp_extract_all(aug,
        |           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
        |         regexp_replace(aug,
        |           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
        |           '<EMAIL>', 'g') AS pass1
        |  FROM aug),
        |r2 AS (
        |  SELECT source, aug, n_emails,
        |         len(regexp_extract_all(pass1, '[0-9]+')) AS n_nums,
        |         regexp_replace(pass1, '[0-9]+', '<NUM>', 'g') AS clean
        |  FROM r)
        |SELECT source, count(*) AS n_docs,
        |       CAST(sum(n_emails) AS BIGINT) AS emails_redacted,
        |       CAST(sum(n_nums) AS BIGINT) AS nums_redacted,
        |       CAST(sum(length(aug) - length(clean)) AS BIGINT) AS chars_removed
        |FROM r2 GROUP BY source ORDER BY source""".stripMargin,
    "pipeline_cap_sources" ->
      s"""WITH counts AS (
         |  SELECT source, count(*) AS n_before,
         |         (15 * 10000) // count(*) AS thresh
         |  FROM documents GROUP BY source),
         |h AS (
         |  SELECT d.source,
         |         ${ihash31Sql("CAST(d.doc_id AS VARCHAR)")} AS ihash
         |  FROM documents d)
         |SELECT c.source, c.n_before, c.thresh,
         |       count(*) AS n_sampled
         |FROM h JOIN counts c ON h.source = c.source
         |WHERE h.ihash % 10000 < c.thresh
         |GROUP BY c.source, c.n_before, c.thresh
         |ORDER BY c.source""".stripMargin,
    "q_crosstab" ->
      """SELECT o_orderstatus AS "o_orderstatus_o_orderpriority",
        |       CAST(count(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS BIGINT) AS "1-URGENT",
        |       CAST(count(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 END) AS BIGINT) AS "2-HIGH",
        |       CAST(count(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 END) AS BIGINT) AS "3-MEDIUM",
        |       CAST(count(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 END) AS BIGINT) AS "4-NOT SPECIFIED",
        |       CAST(count(CASE WHEN o_orderpriority = '5-LOW' THEN 1 END) AS BIGINT) AS "5-LOW"
        |FROM orders GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,
    "q_moments" ->
      """WITH m AS (SELECT l_returnflag, avg(l_quantity) AS mu
        |           FROM lineitem GROUP BY 1),
        |s AS (SELECT l.l_returnflag, count(*) AS n,
        |             sum(pow(l.l_quantity - m.mu, 2)) AS s2,
        |             sum(pow(l.l_quantity - m.mu, 3)) AS s3,
        |             sum(pow(l.l_quantity - m.mu, 4)) AS s4
        |      FROM lineitem l JOIN m ON l.l_returnflag = m.l_returnflag
        |      GROUP BY 1)
        |SELECT l_returnflag, n,
        |       round(sqrt(n) * s3 / pow(s2, 1.5), 6) AS skew,
        |       round(n * s4 / (s2 * s2) - 3, 6) AS kurt
        |FROM s ORDER BY l_returnflag""".stripMargin
  )
}
