package graft

import graft.sources.{SeqScanBuilder, SeqSource}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{EqualTo, GreaterThanOrEqual, LessThan}
import org.apache.spark.sql.types.StructType

/** Tests for the custom DataSourceV2 table (graft.sources.SeqSource):
  * results match the equivalent range derivation, and the three scan
  * optimizations — filter pushdown, partition pruning, column pruning —
  * actually happen (asserted at the ScanBuilder contract, not inferred
  * from timings).
  */
class Dsv2SourceSpec extends SparkSpec {

  private def seq(rows: Long, slices: Int) =
    spark.read.format("graft.sources.SeqSource")
      .option("rows", rows.toString).option("slices", slices.toString).load()

  test("full scan equals the range derivation") {
    val got = seq(1000, 7).orderBy("id").collect()
    val want = spark.range(1000)
      .select(col("id"), (col("id") % 10).as("mod10"),
        concat(lit("n"), col("id")).as("label"))
      .orderBy("id").collect()
    assert(got.toSeq == want.toSeq)
  }

  test("id range filters are absorbed and prune planned partitions") {
    val b = new SeqScanBuilder(1000, 10) // slices of 100 ids each
    val residual = b.pushFilters(Array(
      GreaterThanOrEqual("id", 250L), LessThan("id", 420L),
      EqualTo("mod10", 3L))) // not an id bound — must come back residual
    assert(residual.toSeq == Seq(EqualTo("mod10", 3L)))
    assert(b.pushedFilters().length == 2)
    val parts = b.build().toBatch.planInputPartitions()
    // [250,420) touches slices [200,300) [300,400) [400,500) → 3 of 10
    assert(parts.length == 3)
  }

  test("column pruning reaches the reader") {
    val b = new SeqScanBuilder(100, 2)
    b.pruneColumns(StructType(SeqSource.schema.filter(_.name == "mod10")))
    val scan = b.build()
    assert(scan.readSchema().fieldNames.toSeq == Seq("mod10"))
    // and end-to-end: a projected read returns only the pruned column
    val rows = seq(100, 2).select("mod10").distinct().collect()
    assert(rows.map(_.getLong(0)).sorted.toSeq == (0L until 10L))
  }

  test("filtered read through SQL matches the unfiltered subset") {
    val got = seq(10000, 16)
      .filter(col("id") >= 100 && col("id") < 200 && col("mod10") === 3)
      .select(col("id"), col("label")).orderBy("id").collect()
    assert(got.length == 10)
    assert(got.head.getLong(0) == 103L && got.head.getString(1) == "n103")
    assert(got.last.getLong(0) == 193L)
  }
}
