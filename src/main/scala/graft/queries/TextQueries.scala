package graft.queries

import graft.Tables
import graft.functions.TextFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_langid" -> (langId(_, _)),
    "text_quality" -> (quality(_, _)),
    "text_tokens" -> (tokenStats(_, _)),
    "text_fingerprint" -> (fingerprints(_, _))
  )

  val oracles: Map[String, String] = Map(
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
