package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parameterized grep, Spark-native.
  *
  * Reference semantics (`/root/reference/src/app/grep.rs`):
  *   - aux args carry the search term (grep.rs:18-34) → here a plain Scala
  *     parameter (queries are parameterized functions, not byte blobs)
  *   - lines enumerated 1-based per file (grep.rs:41-45)
  *   - case-sensitive substring match, no regex (grep.rs:44)
  *   - per-file report: files ordered by full path, displayed by basename,
  *     matches ordered by line number, "{basename}:\n\t{lineno}: {line}\n"
  *     (grep.rs:69-102)
  *
  * Line numbers need intra-file order, which `spark.read.text` does not
  * guarantee across splits — so we read wholetext (one row per file, exactly
  * the reference's one-map-task-per-file granularity,
  * `/root/reference/src/worker/mod.rs:166-181`) and `posexplode` the split.
  * At 100 TB with huge single files this becomes the reference's own
  * limitation too (whole file in memory per task); for scale, a splittable
  * format carrying (file, lineno) columns — like the driver's parquet tables
  * — is the right source, which `matches` below consumes directly.
  */
object Grep {

  /** (file, lineno, line) for every line of every file under `path`.
    * split limit=0 drops trailing empty strings (Java semantics) — the
    * reference's `str::lines()` likewise yields nothing after the final
    * newline (grep.rs:41-45); interior empty lines keep their positions.
    * Splitting on `\r?\n` matches `str::lines()` CRLF handling too: the
    * `\r` of a CRLF terminator is not part of the line's content (a bare
    * `\r` without `\n` is content in both).
    */
  def numberedLines(spark: SparkSession, path: String): DataFrame =
    numberedLines(spark, Seq(path))

  def numberedLines(spark: SparkSession, paths: Seq[String]): DataFrame =
    spark.read.option("wholetext", "true").text(paths: _*)
      .select(input_file_name().as("file"), col("value"))
      .select(col("file"),
        posexplode(split(col("value"), "\\r?\\n", 0)).as(Seq("pos", "line")))
      .withColumn("lineno", col("pos") + 1)
      .drop("pos")

  /** Case-sensitive substring filter — the grep predicate (grep.rs:44). */
  def matches(lines: DataFrame, term: String): DataFrame =
    lines.filter(col("line").contains(term))

  def overTextFiles(spark: SparkSession, path: String, term: String): DataFrame =
    overTextFiles(spark, Seq(path), term)

  def overTextFiles(spark: SparkSession, paths: Seq[String], term: String): DataFrame =
    matches(numberedLines(spark, paths), term).orderBy(col("file"), col("lineno"))

  /** Reference-golden report (grep.rs:80-102). Driver-side; tiny fixtures. */
  def report(matched: DataFrame): String = {
    val rows = matched.orderBy(col("file"), col("lineno")).collect()
    val sb = new StringBuilder
    var current: String = null
    rows.foreach { r =>
      val file = r.getAs[String]("file")
      if (file != current) {
        val base = file.substring(file.lastIndexOf('/') + 1)
        sb.append(s"$base:\n")
        current = file
      }
      sb.append(s"\t${r.getAs[Number]("lineno").longValue()}: ${r.getAs[String]("line")}\n")
    }
    sb.toString
  }
}
