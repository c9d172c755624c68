package graft.queries

import graft.sources.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-checkable faces of the multimodal plumbing (graft.sources
  * .Multimodal). The decode stub is deterministic arithmetic over the bytes,
  * so the whole typed mapPartitions pipeline — binary column in, feature
  * schema out — has an exact SQL oracle.
  */
object MultimodalQueries {

  /** Full pipeline: binary media column → per-partition batched "decode" →
    * feature rows. Runs through Dataset[MediaRecord] → mapPartitions →
    * Dataset[MediaFeatures].
    */
  def binaryMeta(s: SparkSession, d: String): DataFrame =
    Multimodal.decodeBatch(Multimodal.fromDocuments(s, d))
      .toDF()
      .orderBy("id")

  /** Metadata-only path: blob bytes never touched (column pruning). */
  def mediaSizes(s: SparkSession, d: String): DataFrame =
    Multimodal.withMeta(Multimodal.fromDocuments(s, d))
      .groupBy("kind")
      .agg(count(lit(1)).as("n_media"), sum("n_bytes").cast("long").as("total_bytes"),
        min("n_bytes").cast("long").as("min_bytes"), max("n_bytes").cast("long").as("max_bytes"))
      .orderBy("kind")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_binary_meta" -> (binaryMeta(_, _)),
    "mm_media_sizes" -> (mediaSizes(_, _))
  )

  val oracles: Map[String, String] = Map(
    "mm_binary_meta" ->
      """SELECT doc_id AS id, 'image' AS kind,
        |       CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
        |       CAST(64 + octet_length(CAST(text AS BLOB)) % 577 AS BIGINT) AS width,
        |       CAST(64 + (ascii(substring(text, 1, 1)) * 7 + octet_length(CAST(text AS BLOB))) % 353 AS BIGINT) AS height,
        |       CAST(3 AS BIGINT) AS channels
        |FROM documents ORDER BY id""".stripMargin,
    "mm_media_sizes" ->
      """SELECT 'image' AS kind, count(*) AS n_media,
        |       CAST(sum(octet_length(CAST(text AS BLOB))) AS BIGINT) AS total_bytes,
        |       CAST(min(octet_length(CAST(text AS BLOB))) AS BIGINT) AS min_bytes,
        |       CAST(max(octet_length(CAST(text AS BLOB))) AS BIGINT) AS max_bytes
        |FROM documents""".stripMargin
  )
}
