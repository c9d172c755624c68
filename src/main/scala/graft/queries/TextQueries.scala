package graft.queries

import graft.Tables
import graft.functions.TextFunctions._
import graft.plans.Fnv1a64
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators over `documents` (north-star ops): language-ID
  * heuristic, quality scoring, token accounting, content fingerprinting.
  * All single-pass, shuffle only on the final aggregate keys — at 100 TB
  * these are embarrassingly parallel scans.
  */
object TextQueries {

  /** Marker-token language-ID heuristic (stopword presence, first match
    * wins). A real system learns n-gram profiles; the *operator shape* — a
    * deterministic per-doc classifier expression — is what scales. Emits
    * prediction next to the labeled lang for accuracy auditing.
    */
  def langId(s: SparkSession, d: String): DataFrame = {
    val toks = spaceTokens(col("text"))
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang"),
        when(array_contains(toks, "the"), "en")
          .when(array_contains(toks, "le") || array_contains(toks, "la"), "fr")
          .when(array_contains(toks, "el") || array_contains(toks, "los"), "es")
          .when(array_contains(toks, "der") || array_contains(toks, "und"), "de")
          .otherwise("unknown").as("lang_pred"))
      .orderBy("doc_id")
  }

  /** Quality signals: token counts, type-token ratio, average token length,
    * stopword ratio. Ratios are exact integer divisions → raw doubles.
    */
  def quality(s: SparkSession, d: String): DataFrame = {
    val toks = spaceTokens(col("text"))
    Tables.documents(s, d)
      .select(
        col("doc_id"),
        col("n_chars"),
        size(toks).cast("long").as("n_tokens"),
        size(array_distinct(toks)).cast("long").as("n_distinct"),
        (size(array_distinct(toks)).cast("double") / size(toks)).as("ttr"),
        ((length(col("text")) - size(toks) + 1).cast("double") / size(toks)).as("avg_token_len"),
        (size(filter(toks, t => t === "the" || t === "a")).cast("double") / size(toks)).as("stopword_ratio"))
      .orderBy("doc_id")
  }

  /** Token accounting per source — the corpus bookkeeping every training
    * pipeline runs (docs, tokens, bounds, mean length).
    */
  def tokenStats(s: SparkSession, d: String): DataFrame = {
    val toks = spaceTokens(col("text"))
    Tables.documents(s, d)
      .select(col("source"), size(toks).cast("long").as("n"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("n").as("total_tokens"),
        min("n").as("min_tokens"), max("n").as("max_tokens"),
        round(avg("n"), 4).as("avg_tokens"))
      .orderBy("source")
  }

  /** Content fingerprints: md5 digest + bucket prefix, the primitive under
    * exact dedup and shard-stable sampling.
    */
  def fingerprints(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(
        col("doc_id"),
        md5(col("text").cast("binary")).as("fp"),
        substring(md5(col("text").cast("binary")), 1, 4).as("bucket"))
      .orderBy("doc_id")

  /** TF-IDF: top-3 scoring terms per document. tf and df are exact integer
    * counts; idf = ln(N/df) evaluates the same double in both engines; rank
    * ties (equal tf and df) break on word. One shuffle for tf, one for df,
    * df side broadcast back onto the term stream.
    */
  def tfidf(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val terms = docs.select(col("doc_id"), explode(spaceTokens(col("text"))).as("word"))
    val tf = terms.groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
    val df = terms.select("doc_id", "word").distinct()
      .groupBy("word").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("word"))
    tf.join(broadcast(df), "word")
      .crossJoin(broadcast(n))
      .withColumn("score", col("tf") * log(col("n_docs").cast("double") / col("df")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("doc_id"), col("word"), col("tf"), col("df"),
        round(col("score"), 6).as("score"), col("rnk"))
      .orderBy("doc_id", "rnk")
  }

  /** BPE-ish token accounting: split into word + punctuation tokens with the
    * `\w+|[^\w\s]` regex (the pre-tokenization most BPE vocabularies use)
    * next to the whitespace count — the token-budget estimate per doc.
    */
  def bpeTokens(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_ws_tokens"),
        size(regexp_extract_all(col("text"), lit("\\w+|[^\\w\\s]"), lit(0)))
          .cast("long").as("n_bpe_tokens"))
      .orderBy("doc_id")

  /** Polynomial rolling hash over the character stream (mod 2^31-1) — the
    * shard-stable fingerprint primitive the north star names; exact
    * cross-engine (integer arithmetic, same fold order).
    */
  def rollingHash(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        aggregate(
          transform(filter(split(col("text"), ""), c => c =!= ""),
            c => ascii(c).cast("long")),
          lit(0L),
          (h, c) => (h * 31L + c) % 2147483647L).as("rhash"))
      .orderBy("doc_id")

  /** One BPE-TRAINING iteration at corpus scale: the top adjacent
    * character-pair frequencies whose argmax becomes the next merge rule.
    * The scale trick is the vocab rollup FIRST — pair explosion runs over
    * the distinct-word vocabulary weighted by word count, never over the
    * corpus character stream, so a 100 TB corpus costs one word-count
    * aggregate (map-side combinable) plus pair counting over a vocab that
    * is millions of rows, not trillions of characters. Ties at the top-20
    * boundary break by pair string, so the emitted set is deterministic.
    * (`text_bpe_tokens` is the inference half; this is the training half.)
    */
  def bpeTrainStep(s: SparkSession, d: String): DataFrame = {
    val vocab = Tables.documents(s, d)
      .select(explode(spaceTokens(col("text"))).as("w"))
      .filter(col("w") =!= "" && length(col("w")) >= 2)
      .groupBy("w").agg(count(lit(1)).as("wcount"))
    vocab
      .select(col("wcount"), explode(
        transform(sequence(lit(1), length(col("w")) - 1),
          i => col("w").substr(i, lit(2)))).as("pair"))
      .groupBy("pair").agg(sum(col("wcount")).as("pair_count"))
      .orderBy(desc("pair_count"), asc("pair"))
      .limit(20)
  }

  /** One BPE merge APPLICATION round — the inference-side complement of
    * `text_bpe_train_step`: take the single argmax pair from the current
    * pair statistics, rewrite the weighted vocabulary with the merge
    * (merged pair → one placeholder symbol, left-to-right non-overlapping
    * like real BPE), and emit the NEXT round's top-10 pair counts over
    * the rewritten vocabulary. Chaining train→apply→train is exactly the
    * BPE training loop; each round stays a vocab-sized aggregate, never a
    * corpus-character-stream pass.
    */
  def bpeApplyMerge(s: SparkSession, d: String): DataFrame = {
    val vocab = Tables.documents(s, d)
      .select(explode(spaceTokens(col("text"))).as("w"))
      .filter(col("w") =!= "" && length(col("w")) >= 2)
      .groupBy("w").agg(count(lit(1)).as("wcount"))
    val merge = vocab
      .select(col("wcount"), explode(
        transform(sequence(lit(1), length(col("w")) - 1),
          i => col("w").substr(i, lit(2)))).as("pair"))
      .groupBy("pair").agg(sum(col("wcount")).as("pair_count"))
      .orderBy(desc("pair_count"), asc("pair")).limit(1)
      .select(col("pair").as("merge_rule"))
    vocab.crossJoin(broadcast(merge))
      .withColumn("w2", replace(col("w"), col("merge_rule"), lit("@")))
      .filter(length(col("w2")) >= 2)
      .select(col("merge_rule"), col("wcount"), explode(
        transform(sequence(lit(1), length(col("w2")) - 1),
          i => col("w2").substr(i, lit(2)))).as("pair"))
      .groupBy("merge_rule", "pair").agg(sum(col("wcount")).as("pair_count"))
      .orderBy(desc("pair_count"), asc("pair")).limit(10)
  }

  /** Language-ID quality readout: the (labeled lang × predicted lang)
    * confusion matrix over `langId`'s per-doc classifier, with per-cell
    * counts and row-relative rates — the evaluation table a production
    * langid filter ships with (text_langid emits per-doc predictions;
    * this is its aggregate truth). One extra aggregate over the same
    * single-pass classifier expression.
    */
  def langIdConfusion(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byLang = Window.partitionBy("lang")
    langId(s, d)
      .groupBy("lang", "lang_pred").agg(count(lit(1)).as("n"))
      .withColumn("lang_total", sum(col("n")).over(byLang))
      .withColumn("rate", round(col("n") / col("lang_total"), 6))
      .select("lang", "lang_pred", "n", "lang_total", "rate")
      .orderBy("lang", "lang_pred")
  }

  /** LLM-watermark detection scoring (the Kirchenbauer-style green-list
    * z-test, re-expressed as a pure scan): token `cur` is "green" w.r.t.
    * its predecessor iff the FNV hash of the `prev|cur` pair is even
    * (γ = 1/2 green-list keyed on the previous token — the hash plays the
    * seeded-RNG vocabulary partition of the published scheme). Per doc the
    * detector reports the green count over the T = n_tokens−1 bigram
    * trials and the one-proportion z-score (g − γT)/√(Tγ(1−γ)); an
    * unwatermarked corpus should flag ≈2.3% of docs at z ≥ 2 — the spec
    * pins that base rate. All arithmetic is integer until the final
    * z (BIGINT-derived doubles, bit-stable cross-engine). Scale: one
    * embarrassingly-parallel scan, no shuffle at all before the sort —
    * the per-pair hash work is the whole cost, linear in corpus bytes. */
  def watermarkDetect(s: SparkSession, d: String): DataFrame = {
    val toks = spaceTokens(col("text"))
    val pairs = zip_with(slice(toks, lit(1), size(toks) - 1), slice(toks, lit(2), size(toks) - 1),
      (a, b) => concat(a, lit("|"), b))
    val green = size(filter(pairs, p => Fnv1a64.ihash31(p) % 2L === 0L))
    Tables.documents(s, d)
      .filter(size(toks) >= 2)
      .select(col("doc_id"),
        (size(toks) - 1).cast("long").as("n_pairs"),
        green.cast("long").as("n_green"))
      .withColumn("z_raw", (col("n_green") - lit(0.5) * col("n_pairs")) /
        (lit(0.5) * sqrt(col("n_pairs").cast("double"))))
      .select(col("doc_id"), col("n_pairs"), col("n_green"),
        round(col("z_raw"), 6).as("z_score"),
        when(col("z_raw") >= 2.0, 1).otherwise(0).as("watermarked"))
      .orderBy("doc_id")
  }

  private val WinK = 5 // gram length
  private val WinW = 4 // winnowing window (guarantee threshold = W+K-1 = 8)

  /** Winnowing fingerprint selection (the MOSS local-minimum scheme): hash
    * every K-char gram, then in each window of W consecutive hashes keep
    * the minimum, tie-broken to the RIGHTMOST occurrence — encoded
    * arithmetically as key = hash·2^21 + (2^21−1−pos) so one integer min
    * implements (hash asc, pos desc) and both engines agree bit-exactly.
    * Selections are deduped by position (one window often re-selects its
    * neighbor's minimum — that is the scheme's density guarantee at work).
    * Emits one row per kept fingerprint: (doc_id, n_grams, pos, fp).
    * Docs shorter than W+K−1 have no full window and are dropped by both
    * engines. Scale: the key array is built ONCE per row (generators
    * evaluate their child a single time) and the window min runs over
    * per-doc ROWS frames — bounded state, the q_window_frame shape. The
    * first cut computed the window mins as a nested HOF
    * (`array_min(slice(keys, …))` inside a `transform`), which
    * re-evaluates the ENTIRE gram-hash array per window element — O(n²)
    * interpreted FNV work per document (HOF lambdas don't codegen and
    * don't share outer subexpressions); it benched fine at sf0.01 and
    * collapsed at sf0.1. The 2^21 position budget bounds docs at 2M
    * chars (fixture max 577).
    */
  def winnowFingerprints(s: SparkSession, d: String): DataFrame = {
    val n = length(col("text"))
    val hashes = transform(sequence(lit(0), n - WinK),
      i => Fnv1a64.ihash31(col("text").substr(i + 1, lit(WinK))))
    val keys = transform(hashes, (h, i) => h * 2097152L + (lit(2097151) - i))
    val win = Window.partitionBy("doc_id").orderBy("i")
      .rowsBetween(-(WinW - 1), 0)
    Tables.documents(s, d)
      .filter(n >= WinK + WinW - 1)
      .select(col("doc_id"), (n - WinK + 1).cast("long").as("n_grams"),
        posexplode(keys).as(Seq("i", "key")))
      .withColumn("wmin", min(col("key")).over(win))
      .filter(col("i") >= WinW - 1)
      .select(col("doc_id"), col("n_grams"), col("wmin").as("key"))
      .distinct()
      .select(col("doc_id"), col("n_grams"),
        (lit(2097151L) - col("key") % 2097152L).as("pos"),
        shiftright(col("key"), 21).as("fp"))
  }

  /** Per-doc winnowing summary — fingerprint count and an order-free
    * checksum of the selected hash set, the compact form a 100 TB
    * fingerprint store would persist per shard. */
  def winnowing(s: SparkSession, d: String): DataFrame =
    winnowFingerprints(s, d)
      .groupBy("doc_id")
      .agg(first(col("n_grams")).as("n_grams"),
        count(lit(1)).as("n_fps"),
        sum(col("fp")).as("fp_checksum"),
        min(col("fp")).as("fp_min"))
      .orderBy("doc_id")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_winnowing" -> (winnowing(_, _)),
    "text_watermark" -> (watermarkDetect(_, _)),
    "text_langid_confusion" -> (langIdConfusion(_, _)),
    "text_bpe_tokens" -> (bpeTokens(_, _)),
    "text_bpe_train_step" -> (bpeTrainStep(_, _)),
    "text_bpe_apply" -> (bpeApplyMerge(_, _)),
    "text_rolling_hash" -> (rollingHash(_, _)),
    "text_tfidf" -> (tfidf(_, _)),
    "text_langid" -> (langId(_, _)),
    "text_quality" -> (quality(_, _)),
    "text_tokens" -> (tokenStats(_, _)),
    "text_fingerprint" -> (fingerprints(_, _))
  )

  val oracles: Map[String, String] = Map(
    "text_winnowing" -> {
      val fnv = OracleSql.fnvIhash31("substr(text, CAST(i + 1 AS INT), 5)")
      s"""WITH d AS (
         |  SELECT doc_id, text, length(text) AS n FROM documents
         |  WHERE length(text) >= 8),
         |g AS (
         |  SELECT doc_id, i,
         |         CAST($fnv AS BIGINT) * 2097152 + (2097151 - i) AS key
         |  FROM d, LATERAL (SELECT unnest(generate_series(0, n - 5)) AS i)),
         |w AS (
         |  SELECT doc_id, e
         |  FROM d, LATERAL (SELECT unnest(generate_series(3, n - 5)) AS e)),
         |sel AS (
         |  SELECT w.doc_id, w.e, min(g.key) AS key
         |  FROM w JOIN g ON g.doc_id = w.doc_id AND g.i BETWEEN w.e - 3 AND w.e
         |  GROUP BY w.doc_id, w.e),
         |fp AS (SELECT DISTINCT doc_id, key FROM sel),
         |agg AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fps,
         |         CAST(sum(key >> 21) AS BIGINT) AS fp_checksum,
         |         CAST(min(key >> 21) AS BIGINT) AS fp_min
         |  FROM fp GROUP BY doc_id)
         |SELECT d.doc_id, CAST(d.n - 4 AS BIGINT) AS n_grams,
         |       a.n_fps, a.fp_checksum, a.fp_min
         |FROM d JOIN agg a ON a.doc_id = d.doc_id
         |ORDER BY d.doc_id""".stripMargin
    },
    "text_watermark" -> {
      val fnv = OracleSql.fnvIhash31("pair")
      s"""WITH toks AS (
         |  SELECT doc_id, string_split(text, ' ') AS l FROM documents
         |  WHERE len(string_split(text, ' ')) >= 2),
         |pairs AS (
         |  SELECT doc_id, l[CAST(i AS INT)] || '|' || l[CAST(i AS INT) + 1] AS pair
         |  FROM toks,
         |       LATERAL (SELECT unnest(generate_series(1, len(l) - 1)) AS i)),
         |g AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_pairs,
         |         CAST(sum(CASE WHEN $fnv % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_green
         |  FROM pairs GROUP BY doc_id),
         |z AS (
         |  SELECT doc_id, n_pairs, n_green,
         |         (n_green - 0.5 * n_pairs) / (0.5 * sqrt(CAST(n_pairs AS DOUBLE))) AS z_raw
         |  FROM g)
         |SELECT doc_id, n_pairs, n_green, round(z_raw, 6) AS z_score,
         |       CASE WHEN z_raw >= 2.0 THEN 1 ELSE 0 END AS watermarked
         |FROM z ORDER BY doc_id""".stripMargin
    },
    "text_bpe_apply" ->
      """WITH vocab AS (
        |  SELECT t AS w, CAST(count(*) AS BIGINT) AS wcount
        |  FROM (SELECT unnest(string_split(text, ' ')) AS t FROM documents)
        |  WHERE t <> '' AND length(t) >= 2
        |  GROUP BY t),
        |merge AS (
        |  SELECT pair AS merge_rule FROM (
        |    SELECT substr(w, CAST(i AS INT), 2) AS pair,
        |           CAST(sum(wcount) AS BIGINT) AS pair_count
        |    FROM vocab,
        |         LATERAL (SELECT unnest(generate_series(1, length(w) - 1)) AS i)
        |    GROUP BY 1)
        |  ORDER BY pair_count DESC, pair LIMIT 1),
        |v2 AS (
        |  SELECT merge_rule, wcount, replace(w, merge_rule, '@') AS w2
        |  FROM vocab CROSS JOIN merge),
        |p2 AS (
        |  SELECT merge_rule, substr(w2, CAST(i AS INT), 2) AS pair, wcount
        |  FROM v2,
        |       LATERAL (SELECT unnest(generate_series(1, length(w2) - 1)) AS i)
        |  WHERE length(w2) >= 2)
        |SELECT merge_rule, pair, CAST(sum(wcount) AS BIGINT) AS pair_count
        |FROM p2 GROUP BY 1, 2
        |ORDER BY pair_count DESC, pair LIMIT 10""".stripMargin,
    "text_bpe_train_step" ->
      """WITH vocab AS (
        |  SELECT t AS w, CAST(count(*) AS BIGINT) AS wcount
        |  FROM (SELECT unnest(string_split(text, ' ')) AS t FROM documents)
        |  WHERE t <> '' AND length(t) >= 2
        |  GROUP BY t),
        |pairs AS (
        |  SELECT substr(w, CAST(i AS INT), 2) AS pair, wcount
        |  FROM vocab,
        |       LATERAL (SELECT unnest(generate_series(1, length(w) - 1)) AS i))
        |SELECT pair, CAST(sum(wcount) AS BIGINT) AS pair_count
        |FROM pairs GROUP BY pair
        |ORDER BY pair_count DESC, pair LIMIT 20""".stripMargin,
    "text_bpe_tokens" ->
      """SELECT doc_id,
        |       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
        |       CAST(len(regexp_extract_all(text, '\w+|[^\w\s]')) AS BIGINT) AS n_bpe_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_rolling_hash" ->
      """SELECT doc_id,
        |       list_reduce(
        |         list_prepend(0::BIGINT,
        |           list_transform(string_split_regex(text, ''),
        |                          c -> CAST(unicode(c) AS BIGINT))),
        |         (h, c) -> (h * 31 + c) % 2147483647) AS rhash
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_tfidf" ->
      """WITH terms AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
        |), tf AS (
        |  SELECT doc_id, word, count(*) AS tf FROM terms GROUP BY 1, 2
        |), df AS (
        |  SELECT word, count(*) AS df
        |  FROM (SELECT DISTINCT doc_id, word FROM terms) GROUP BY word
        |), n AS (SELECT count(*) AS n_docs FROM documents),
        |scored AS (
        |  SELECT tf.doc_id, tf.word, tf.tf, df.df,
        |         tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df) AS score
        |  FROM tf JOIN df USING (word) CROSS JOIN n),
        |ranked AS (
        |  SELECT doc_id, word, tf, df, score,
        |         CAST(row_number() OVER (PARTITION BY doc_id
        |              ORDER BY score DESC, word) AS INT) AS rnk
        |  FROM scored)
        |SELECT doc_id, word, tf, df, round(score, 6) AS score, rnk
        |FROM ranked WHERE rnk <= 3
        |ORDER BY doc_id, rnk""".stripMargin,
    "text_langid_confusion" ->
      """WITH pred AS (
        |  SELECT lang,
        |         CASE WHEN list_contains(string_split(text, ' '), 'the') THEN 'en'
        |              WHEN list_contains(string_split(text, ' '), 'le')
        |                OR list_contains(string_split(text, ' '), 'la') THEN 'fr'
        |              WHEN list_contains(string_split(text, ' '), 'el')
        |                OR list_contains(string_split(text, ' '), 'los') THEN 'es'
        |              WHEN list_contains(string_split(text, ' '), 'der')
        |                OR list_contains(string_split(text, ' '), 'und') THEN 'de'
        |              ELSE 'unknown' END AS lang_pred
        |  FROM documents),
        |cells AS (SELECT lang, lang_pred, CAST(count(*) AS BIGINT) AS n
        |          FROM pred GROUP BY 1, 2)
        |SELECT lang, lang_pred, n,
        |       CAST(sum(n) OVER (PARTITION BY lang) AS BIGINT) AS lang_total,
        |       round(n / (sum(n) OVER (PARTITION BY lang)), 6) AS rate
        |FROM cells ORDER BY lang, lang_pred""".stripMargin,
    "text_langid" ->
      """SELECT doc_id, lang,
        |       CASE WHEN list_contains(string_split(text, ' '), 'the') THEN 'en'
        |            WHEN list_contains(string_split(text, ' '), 'le')
        |              OR list_contains(string_split(text, ' '), 'la') THEN 'fr'
        |            WHEN list_contains(string_split(text, ' '), 'el')
        |              OR list_contains(string_split(text, ' '), 'los') THEN 'es'
        |            WHEN list_contains(string_split(text, ' '), 'der')
        |              OR list_contains(string_split(text, ' '), 'und') THEN 'de'
        |            ELSE 'unknown' END AS lang_pred
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_quality" ->
      """SELECT doc_id, n_chars,
        |       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |       CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct,
        |       len(list_distinct(string_split(text, ' '))) * 1.0 / len(string_split(text, ' ')) AS ttr,
        |       (length(text) - len(string_split(text, ' ')) + 1) * 1.0 / len(string_split(text, ' ')) AS avg_token_len,
        |       len(list_filter(string_split(text, ' '), t -> t = 'the' OR t = 'a')) * 1.0
        |         / len(string_split(text, ' ')) AS stopword_ratio
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_tokens" ->
      """SELECT source, count(*) AS n_docs,
        |       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
        |       min(CAST(len(string_split(text, ' ')) AS BIGINT)) AS min_tokens,
        |       max(CAST(len(string_split(text, ' ')) AS BIGINT)) AS max_tokens,
        |       round(avg(len(string_split(text, ' '))), 4) AS avg_tokens
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    "text_fingerprint" ->
      """SELECT doc_id, md5(text) AS fp, substring(md5(text), 1, 4) AS bucket
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
