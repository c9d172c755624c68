package graft.tools

import graft.queries.CatalogQueries
import org.apache.spark.sql.SparkSession

/** Dev utility: execute the q_skew_join_aqe join shape at an arbitrary
  * (typically upscaled) SF directory and report whether AQE's
  * OptimizeSkewedJoin actually engaged — the runtime evidence the sf1
  * scaling sweep needs, since the registry query itself settles eagerly
  * and discards its executed plan.
  *
  * The key-offset sf1 upscale preserves distribution shapes for raw-key
  * shuffles, so most registry queries are skew-free at sf1 by
  * construction; q_skew_join_aqe's DERIVED key collapses every replica
  * onto one literal hot key (see CatalogQueries.skewJoinShape), making it
  * the shuffle that stays hot at scale. This probe runs that shape under
  * the exact session confs the registry query executes with, collects it,
  * and prints: wall seconds, row count, the number of `skew=true`
  * sort-merge-join marks in the AQE final plan, and the AQEShuffleRead
  * lines carrying the skew-split partition counts.
  *
  * Expected result by SF: ENGAGED at sf1 (hot block ≈5.94M rows — its
  * lz4-compressed MapOutputStatistics bytes cross the 256KB detection
  * threshold), NOT engaged at ≤ sf0.1 (594k near-constant (k, qty) rows
  * shuffle-compress to under the same threshold — skew detection reads
  * COMPRESSED map-output bytes, the effect PlanShapeSpec's fixture-scale
  * pin sidesteps with an incompressible md5 pad + 16KB threshold). The
  * probe therefore requires skew=true and is meant for upscaled dirs:
  * the sf0.1→sf1 flip IS the demonstration that the split is driven by
  * runtime shuffle statistics, not plan-time heuristics.
  *
  * Usage: runMain graft.tools.SkewProbe <sfDir>
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    CatalogQueries.skewJoinConfs.foreach { case (k, v) => spark.conf.set(k, v) }
    val df = CatalogQueries.skewJoinShape(spark, sfDir)
    val t0 = System.nanoTime()
    val n = df.collect().length
    val secs = (System.nanoTime() - t0) / 1e9
    val plan = df.queryExecution.executedPlan.toString
    val skewMarks = "skew=true".r.findAllMatchIn(plan).length
    println(f"sfDir=$sfDir rows=$n wall=$secs%.2fs skew_true_marks=$skewMarks")
    plan.linesIterator
      .filter(l => l.contains("AQEShuffleRead") || l.contains("skew=true"))
      .foreach(l => println("  " + l.trim))
    require(skewMarks > 0,
      s"AQE skew split did NOT engage at $sfDir — plan:\n$plan")
    spark.stop()
  }
}
