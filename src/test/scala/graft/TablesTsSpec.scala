package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampType, LongType}

/** Direct pin for Tables.normalizeTs — the schema-drift adapter that broke
  * round 4 (driver fixtures regenerated from ns-long to timestamp[us]; 38
  * queries failed until load() normalized conditionally). All three input
  * shapes must land on TimestampType at the SAME instant:
  * 2023-11-14T22:13:20.123456Z = 1,700,000,000.123456 epoch seconds.
  */
class TablesTsSpec extends SparkSpec {
  import spark.implicits._

  private val micros = 1700000000123456L

  private def microsOf(df: org.apache.spark.sql.DataFrame): Long = {
    val out = Tables.normalizeTs(df, df.schema("ts").dataType)
    assert(out.schema("ts").dataType == TimestampType, out.schema.treeString)
    out.select(unix_micros(col("ts"))).head().getLong(0)
  }

  test("ns-long, timestamp[us], and timestamp_ntz inputs land on one instant") {
    // nanosAsLong fixtures: BIGINT nanoseconds (sub-microsecond truncates)
    val ns = Seq(micros * 1000L + 789L).toDF("ts")
    assert(ns.schema("ts").dataType == LongType)
    assert(microsOf(ns) == micros)
    // already-typed timestamp[us]: identity
    val us = spark.range(1).select(timestamp_micros(lit(micros)).as("ts"))
    assert(microsOf(us) == micros)
    // timestamp_ntz (the regenerated-fixture type): cast under the UTC
    // session timezone pins wall time = instant
    val ntz = spark.range(1).select(
      expr("cast('2023-11-14 22:13:20.123456' as timestamp_ntz)").as("ts"))
    assert(microsOf(ntz) == micros)
  }
}
