package graft

import graft.queries.{AdvancedQueries, MixQueries}
import org.apache.spark.sql.functions._

/** Invariant tests for the twentieth batch: GROUP BY ALL, IDENTIFIER
  * binding, round-robin source interleaving.
  */
class InterleaveOpsSpec extends SparkSpec {

  test("group by all infers the same keys as the explicit form") {
    val all = AdvancedQueries.groupByAll(spark, sf).collect()
    val explicit = spark.read.parquet(s"$sf/orders.parquet")
      .groupBy("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("cnt"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("sum_price_c"))
      .orderBy("o_orderstatus", "o_orderpriority").collect()
    assert(all.map(_.toSeq).toSeq === explicit.map(_.toSeq).toSeq)
  }

  test("identifier binding resolves the parameterized table name") {
    val rows = AdvancedQueries.sqlIdentifier(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("cnt")).sum ===
      spark.read.parquet(s"$sf/customer.parquet").count())
  }

  test("interleave: positions unique, every n_src-window touches all sources") {
    val rows = MixQueries.interleaveSources(spark, sf).collect()
      .sortBy(_.getAs[Long]("global_pos"))
    assert(rows.map(_.getAs[Long]("global_pos")).distinct.length === rows.length)
    val nSrc = rows.map(_.getAs[String]("source")).distinct.length
    // while every source still has docs remaining, each consecutive
    // n_src-window must contain n_src distinct sources
    val minDocs = rows.groupBy(_.getAs[String]("source")).values.map(_.length).min
    rows.take(minDocs * nSrc).grouped(nSrc).foreach { window =>
      assert(window.map(_.getAs[String]("source")).distinct.length === nSrc,
        "a full round-robin window must touch every source")
    }
  }
}
