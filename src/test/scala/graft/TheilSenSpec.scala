package graft

import graft.queries.SignalQueries
import org.apache.spark.sql.functions._

/** Theil-Sen on a planted line: 21 of 24 hourly points lie exactly on
  * y = 2x + 5 and three carry +1000 outliers — the median-of-slopes fit
  * must recover slope 2 and intercept 5 EXACTLY (76% of pairs are clean,
  * so both medians sit on clean values), which one outlier alone would
  * already deny OLS.
  */
class TheilSenSpec extends SparkSpec {

  test("recovers the planted line exactly through 3/24 outliers") {
    import spark.implicits._
    val rows = (0 until 24).map { h =>
      val outlier = Set(5, 11, 17).contains(h)
      val v = 2.0 * h + 5.0 + (if (outlier) 1000.0 else 0.0)
      (h.toLong, f"2024-01-01 $h%02d:30:00", 1L, "view", v, "{}")
    }
    val tmp = java.nio.file.Files.createTempDirectory("theilsen").toString
    rows.toDF("event_id", "ts_s", "user_id", "event_type", "value", "props")
      .withColumn("ts", to_timestamp(col("ts_s")))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$tmp/events.parquet")
    val got = SignalQueries.theilSen(spark, tmp).collect()(0)
    assert(got.getAs[Long]("n_points") === 24L)
    assert(got.getAs[Long]("n_pairs") === 276L)
    assert(got.getAs[Double]("slope") === 2.0, "median slope must ignore the outliers")
    assert(got.getAs[Double]("icept") === 5.0, "median residual must ignore the outliers")
  }
}
