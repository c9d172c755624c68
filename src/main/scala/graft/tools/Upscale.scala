package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only fixture upscaler for scaling-curve measurements beyond the
  * driver-provided scale factors (TESTDATA.md tops out at sf0.1). Produces
  * an N× copy of a fixture directory by UNIONING N key-offset replicas of
  * each fact table: every int64 join/entity key in replica i is shifted by
  * i·2^34, so join selectivity, group cardinality ratios, and distribution
  * shapes are preserved exactly (each replica joins only within itself)
  * while data volume scales linearly — the property a scaling curve needs.
  * Dimension tables (region, nation) and non-key attributes are copied
  * verbatim. Never writes into /root/testdata; point outDir at /tmp.
  *
  * Usage: runMain graft.tools.Upscale <inDir> <outDir> <copies>
  */
object Upscale {

  /** int64 key columns to shift per replica, per table. int32 dimension
    * FKs (nationkey/regionkey) deliberately stay — dims are shared.
    */
  val keyCols: Map[String, Seq[String]] = Map(
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "orders" -> Seq("o_orderkey", "o_custkey"),
    "customer" -> Seq("c_custkey"),
    "part" -> Seq("p_partkey"),
    "supplier" -> Seq("s_suppkey"),
    "events" -> Seq("event_id", "user_id"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"),
    "nation" -> Seq(),
    "region" -> Seq()
  )

  private val Unit64: Long = 1L << 34

  def upscaled(spark: SparkSession, inDir: String, table: String,
      copies: Int): DataFrame = {
    val base = spark.read.parquet(s"$inDir/$table.parquet")
    val keys = keyCols(table).toSet
    if (keys.isEmpty) base
    else (0 until copies).map { i =>
      base.select(base.columns.toIndexedSeq.map { c =>
        if (keys(c)) (col(c) + lit(i * Unit64)).as(c) else col(c)
      }: _*)
    }.reduce(_.union(_))
  }

  def main(args: Array[String]): Unit = {
    if (args.length != 3 || args(2).toIntOption.forall(_ < 1)) {
      System.err.println("usage: Upscale <inDir> <outDir> <copies >= 1>")
      sys.exit(2)
    }
    val Array(inDir, outDir, copiesStr) = args
    val copies = copiesStr.toInt
    require(!outDir.startsWith("/root/testdata"), "refusing to write into the read-only fixtures")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    keyCols.keys.toSeq.sorted.foreach { t =>
      upscaled(spark, inDir, t, copies)
        .write.mode("overwrite").parquet(s"$outDir/$t.parquet")
      println(s"upscaled $t x$copies")
    }
    spark.stop()
  }
}
