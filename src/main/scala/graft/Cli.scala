package graft

import graft.operators.{Grep, VertexDegree, WordCount}
import org.apache.spark.sql.SparkSession

/** CLI entry point — the Spark-native analog of the reference's client
  * (`/root/reference/src/bin/client.rs`: submit+process for a named app over
  * input files). Prints the app's golden-format report to stdout.
  *
  * Usage:  runMain graft.Cli wc <path>
  *         runMain graft.Cli grep <path> <term>
  *         runMain graft.Cli vertex-degree <path>
  */
object Cli {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .appName("graft-cli")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      args.toList match {
        case "wc" :: path :: Nil =>
          print(WordCount.report(WordCount.overTextFiles(spark, path)))
        case "grep" :: path :: term :: Nil =>
          print(Grep.report(Grep.overTextFiles(spark, path, term)))
        case ("vertex-degree" | "vdeg") :: path :: Nil =>
          print(VertexDegree.report(VertexDegree.overTextFiles(spark, path)))
        case other =>
          System.err.println(
            s"unknown invocation: ${other.mkString(" ")}\n" +
              "usage: wc <path> | grep <path> <term> | vertex-degree <path>")
          sys.exit(2)
      }
    } finally spark.stop()
  }
}
