package graft

import org.apache.spark.sql.functions._

/** Bucketing: the pre-partitioned co-located join path (SURVEY.md §4 100 TB
  * notes). Both fact tables bucketed+sorted on the join key → the equi-join
  * reads bucket-aligned files and skips the shuffle entirely. Also proves
  * the GraftExtensions session wiring (fnv1a64 resolves via the extension
  * injection, not temp-function registration).
  */
class BucketingSpec extends SparkSpec {

  test("bucketed tables co-locate the join: no shuffle exchange in the plan") {
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    spark.read.parquet(s"$sf/orders.parquet")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("orders_b")
    spark.read.parquet(s"$sf/lineitem.parquet")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("lineitem_b")

    val joined = spark.table("lineitem_b")
      .join(spark.table("orders_b"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus").agg(count(lit(1)).as("cnt"))

    val expected = spark.read.parquet(s"$sf/lineitem.parquet")
      .join(spark.read.parquet(s"$sf/orders.parquet"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus").agg(count(lit(1)).as("cnt"))
    assert(joined.orderBy("o_orderstatus").collect().toSeq ==
      expected.orderBy("o_orderstatus").collect().toSeq)

    // the join itself must not shuffle either side: with both inputs
    // bucketed on the key, the only exchange allowed is the one AFTER the
    // join feeding the 1-key aggregation
    val plan = joined.queryExecution.executedPlan.toString
    val joinPart = plan.substring(plan.indexOf("Join"))
    assert(!joinPart.contains("Exchange hashpartitioning(l_orderkey") &&
      !joinPart.contains("Exchange hashpartitioning(o_orderkey"),
      s"join sides were shuffled:\n$plan")
  }

  test("extension-injected fnv1a64 resolves in SQL without manual registration") {
    val r = spark.sql("SELECT fnv1a64('foobar') AS h").collect()(0).getLong(0)
    assert(r == 0x85944171f73967e8L)
  }
}
