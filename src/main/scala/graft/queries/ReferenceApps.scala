package graft.queries

import graft.Tables
import graft.operators.{Grep, VertexDegree, WordCount}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The three reference applications (wc, grep, vertex-degree —
  * `/root/reference/src/app/`) re-expressed over the driver's parquet tables
  * so they pass through the DuckDB-oracle gate. Golden-output parity against
  * the reference's own text fixtures lives in the test suite
  * (ReferenceGoldenSpec), which exercises the same operator objects.
  */
object ReferenceApps {

  /** wc over `documents.text` (semantics of /root/reference/src/app/wc.rs,
    * order (count ASC, word ASC)). Corpus is ASCII, so `[^\p{L}]+`
    * tokenization ≡ `[^a-z]+` on lowered text — the oracle uses the latter.
    */
  def wcWordcount(s: SparkSession, dir: String): DataFrame =
    WordCount.counts(Tables.documents(s, dir))

  /** grep(term="spark") over documents: case-sensitive substring predicate
    * (grep.rs:44); one row per matching document, ordered by doc_id.
    */
  def grepContains(s: SparkSession, dir: String, term: String = "spark"): DataFrame =
    Grep.matches(
      Tables.documents(s, dir).select(col("doc_id"), col("source"),
        col("lang"), col("text").as("line")), term)
      .orderBy("doc_id")

  /** vertex-degree over the bipartite (part, supplier) graph induced by
    * lineitem: each lineitem row is an edge, both endpoints count, duplicate
    * edges NOT deduped (vertex_degree.rs:32-53). Suppliers and parts live in
    * disjoint id spaces after offsetting suppkey.
    */
  def vertexDegree(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir).select(
      col("l_partkey").as("src"),
      // shift suppliers out of the part id space so the graph is bipartite
      (col("l_suppkey") + lit(1000000L)).as("dst"))
    VertexDegree.degrees(li)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "wc_wordcount" -> (wcWordcount(_, _)),
    "grep_contains" -> (grepContains(_, _, "spark")),
    "vertex_degree" -> (vertexDegree(_, _))
  )

  val oracles: Map[String, String] = Map(
    "wc_wordcount" ->
      """SELECT word, count(*) AS cnt
        |FROM (SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS word
        |      FROM documents)
        |WHERE word <> ''
        |GROUP BY word
        |ORDER BY cnt ASC, word ASC""".stripMargin,
    "grep_contains" ->
      """SELECT doc_id, source, lang, text AS line
        |FROM documents
        |WHERE contains(text, 'spark')
        |ORDER BY doc_id""".stripMargin,
    "vertex_degree" ->
      """SELECT vertex, count(*) AS degree
        |FROM (SELECT l_partkey AS vertex FROM lineitem
        |      UNION ALL
        |      SELECT l_suppkey + 1000000 AS vertex FROM lineitem)
        |GROUP BY vertex
        |ORDER BY vertex""".stripMargin
  )
}
