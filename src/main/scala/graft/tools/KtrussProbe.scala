package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: phase-timing breakdown for graph_ktruss — times the edge
  * projection, orientation, first wedge enumeration + support pass, and the
  * full query, so constant-factor work targets the measured phase instead of
  * a guess (same rationale as StreamProbe).
  * Usage: KtrussProbe <sfDir>
  */
object KtrussProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"  $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }

    import graft.queries.GraphQueries
    def reset(): Unit = {
      GraphQueries.reset(); graft.Tables.reset()
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
    }
    // pass 1 = the cold (bench-window) cost, pass 2+ = the warm floor;
    // the r8 A/B against the retired re-orient-per-round shape measured
    // cold 12.98 -> 7.86 s, warm 6.9 ~= 6.9 s (wedge enumeration dominates
    // the warm floor; the cold win is fewer distinct plan shapes)
    for (i <- 1 to 3) {
      println(s"== pass $i")
      reset()
      timed("graph_ktruss") {
        GraphQueries.ktruss(spark, sfDir).count()
      }
    }
    spark.stop()
  }
}
