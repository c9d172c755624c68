package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Vertex degree over an edge list, Spark-native.
  *
  * Reference semantics (`/root/reference/src/app/vertex_degree.rs`):
  *   - each line: first two whitespace-separated u64s (src, dst); malformed
  *     lines are a fatal error (vertex_degree.rs:12-27) — we keep fail-fast
  *     by casting strictly and raising on null
  *   - each edge increments BOTH endpoints; self-loops count twice and
  *     duplicate edges are not deduped (vertex_degree.rs:32-53)
  *   - output ordered by vertex id ASC, "{vertex}\t{degree}" (73-89)
  *
  * Plan: scan → project two key columns → explode to one row per endpoint →
  * partial + final hash-agg on vertex → sort. One shuffle, keyed on vertex;
  * AQE handles any hub-vertex skew at scale (a power-law graph at 100 TB
  * would otherwise hot-spot the reducers holding celebrity vertices).
  */
object VertexDegree {

  /** Degrees from a DataFrame of (src, dst) long columns. */
  def degrees(edges: DataFrame, srcCol: String = "src", dstCol: String = "dst"): DataFrame =
    edges
      .select(explode(array(col(srcCol), col(dstCol))).as("vertex"))
      .groupBy("vertex")
      .agg(count(lit(1)).as("degree"))
      .orderBy("vertex")

  /** Parse `src<ws>dst` text lines into edges; strict like the reference —
    * a malformed line fails the job rather than silently dropping.
    */
  def parseEdges(spark: SparkSession, path: String): DataFrame =
    parseEdges(spark, Seq(path))

  def parseEdges(spark: SparkSession, paths: Seq[String]): DataFrame = {
    val toks = split(trim(col("value")), "\\s+")
    spark.read.text(paths: _*)
      .filter(length(trim(col("value"))) > 0)
      .select(
        toks.getItem(0).cast("long").as("src"),
        toks.getItem(1).cast("long").as("dst"))
      .select(
        assertNonNull(col("src")).as("src"),
        assertNonNull(col("dst")).as("dst"))
  }

  /** Fail-fast null guard mirroring vertex_degree.rs:26-27 (parse error ⇒
    * job fails). `assert_true` returns null on pass, raises on fail.
    */
  private def assertNonNull(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(assert_true(c.isNotNull, lit("malformed edge line")).isNull, c)

  def overTextFiles(spark: SparkSession, path: String): DataFrame =
    overTextFiles(spark, Seq(path))

  def overTextFiles(spark: SparkSession, paths: Seq[String]): DataFrame =
    degrees(parseEdges(spark, paths))

  /** Reference-golden report: "{vertex}\t{degree}\n" (vertex_degree.rs:82-89). */
  def report(deg: DataFrame): String =
    deg.orderBy("vertex").collect()
      .map(r => s"${r.getLong(0)}\t${r.getLong(1)}\n").mkString
}
