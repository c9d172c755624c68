package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: phase-timing breakdown for graph_ktruss — times the edge
  * projection, orientation, first wedge enumeration + support pass, and the
  * full query, so constant-factor work targets the measured phase instead of
  * a guess (same rationale as StreamProbe).
  * Usage: KtrussProbe <sfDir> [passes=3]
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
    val passes = args.lift(1).map(_.toInt).getOrElse(3)
    sys.props("graft.ktruss.logRounds") = "1"
    // setup-phase attribution (same chain ktruss builds, timed piecewise)
    if (sys.env.contains("GRAFT_KTRUSS_PHASES")) {
      import org.apache.spark.sql.functions._
      reset()
      val und = timed("coOrderEdges eval+ckpt") {
        val u = GraphQueries.coOrderEdges(spark, sfDir).localCheckpoint(false)
        u.count(); u
      }
      val deg = und.select(col("u").as("vtx"))
        .union(und.select(col("v").as("vtx")))
        .groupBy("vtx").agg(count(lit(1)).as("deg"))
      timed("deg count") { deg.count() }
      import spark.implicits._
      val ranked = timed("rank build (sort+zipWithIndex)") {
        val r = deg.select(col("vtx"),
            GraphQueries.vertexOrd(col("deg"), col("vtx")).as("ord"))
          .orderBy("ord").select("vtx").rdd
          .zipWithIndex.map { case (row, i) => (row.getLong(0), i) }
          .toDF("vtx", "rank")
        r.count(); r
      }
      val cur = timed("remap join + ckpt") {
        val c = und.join(broadcast(ranked.select(col("vtx").as("u"), col("rank").as("ru"))), "u")
          .join(broadcast(ranked.select(col("vtx").as("v"), col("rank").as("rv"))), "v")
          .select((shiftleft(least(col("ru"), col("rv")), 32) +
            greatest(col("ru"), col("rv"))).as("pk"))
          .localCheckpoint(false)
        c.count(); c
      }
      // round-1 internals on the full graph (shuffle path, no hints —
      // mirrors fit=false at sf10's 60M initial edges)
      val e = cur.select(shiftright(col("pk"), 32).as("a"),
        col("pk").bitwiseAND(lit(0xFFFFFFFFL)).as("b"))
      val wedges = e.select(col("a"), col("b").as("y"))
        .join(e.select(col("a").as("a2"), col("b").as("z")),
          col("a") === col("a2") && col("y") < col("z"))
        .select(col("a"), col("y"), col("z"),
          (shiftleft(col("y"), 32) + col("z")).as("wpk"))
      val nW = timed("wedge count") { wedges.count() }
      println(s"    W = $nW")
      val tri = wedges.join(
        cur.select(col("pk").as("wpk")).hint("SHUFFLE_HASH"), "wpk")
      val nT = timed("wedges+close SHJ (T count)") { tri.count() }
      println(s"    T = $nT")
      timed("round-1 support agg (SHJ close)") {
        tri.select(explode(array(
            shiftleft(col("a"), 32) + col("y"),
            shiftleft(col("a"), 32) + col("z"),
            col("wpk"))).as("pk"))
          .groupBy("pk").agg(count(lit(1)).as("s"))
          .filter(col("s") >= 6).count()
      }
    }
    for (i <- 1 to passes) {
      println(s"== pass $i")
      reset()
      timed("graph_ktruss") {
        GraphQueries.ktruss(spark, sfDir).count()
      }
    }
    spark.stop()
  }
}
