package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only machine-window probe: runs ONE registry query N times in a
  * single JVM on the bench conf and prints each wall time. Separates
  * "host is uniformly slower for Spark work" (steady-state time inflated vs
  * the committed BENCH_DETAIL.json reference) from "between-query overhead /
  * JIT warm-up" (steady state matches reference while early iterations are
  * inflated). Added in round 10 while adjudicating the third consecutive
  * ~1.5x-vs-r8 bench window.
  *
  * Usage: SteadyProbe <queryName> [iters=10] (env SPARK_GRAFT_SF_DIR,
  * SPARK_GRAFT_CPUS as in Bench).
  */
object SteadyProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val iters = if (args.length > 1) args(1).toInt else 10
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries(name)
    for (i <- 1 to iters) {
      graft.queries.DedupQueries.reset()
      graft.queries.GraphQueries.reset()
      graft.Tables.reset()
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      System.gc()
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      println(f"[steady] $name iter $i%2d: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
