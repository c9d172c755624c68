package graft

import graft.queries.AdvancedQueries
import org.apache.spark.sql.functions._

/** Two-phase distributed skyline vs the driver-side quadratic dominance
  * check, plus the phase-1 soundness property (no global skyline point is
  * dropped by any partition-local sweep) exercised through partition-count
  * variation.
  */
class SkylineSpec extends SparkSpec {

  private def brute(pts: Seq[(Long, Long, Long)]): Set[(Long, Long, Long)] =
    pts.filter { case (_, ap, as_) =>
      !pts.exists { case (_, bp, bs) =>
        bp <= ap && bs >= as_ && (bp < ap || bs > as_)
      }
    }.toSet

  test("skyline equals quadratic dominance check (two SFs)") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val pts = spark.read.parquet(s"$dir/part.parquet")
        .select(col("p_partkey"),
          round(col("p_retailprice") * 100).cast("long"),
          col("p_size").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      val want = brute(pts)
      val got = AdvancedQueries.skyline(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got === want, s"skyline mismatch at $dir")
    }
  }

  test("result is invariant to input partitioning, incl. duplicate frontier points") {
    import spark.implicits._
    // duplicate pareto-optimal pair (1,10) must BOTH survive; (5,5) is
    // dominated by (1,10); (0,1) and (1,10) are mutually non-dominating
    val pts = Seq((101L, 1L, 10L), (102L, 1L, 10L), (103L, 5L, 5L),
      (104L, 0L, 1L), (105L, 3L, 10L), (106L, 0L, 0L))
    val want = brute(pts)
    for (parts <- Seq(1, 2, 5)) {
      val tmp = java.nio.file.Files.createTempDirectory("skyspec").toString
      pts.toDF("id", "price", "size").repartition(parts)
        .select(col("id").as("p_partkey"),
          (col("price").cast("double") / 100.0).as("p_retailprice"),
          col("size").cast("int").as("p_size"))
        .write.parquet(s"$tmp/part.parquet")
      val got = AdvancedQueries.skyline(spark, tmp).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got === want, s"mismatch with $parts partitions")
    }
  }
}
