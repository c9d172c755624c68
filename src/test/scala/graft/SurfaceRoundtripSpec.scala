package graft

import graft.queries.{CatalogQueries, JoinQueries, PipelineQueries, StreamingBridge}
import org.apache.spark.sql.functions._

/** Invariant + plan-pin tests for the twelfth-batch surfaces: binaryFile
  * source, parquet schema-evolution read, k-anonymity audit, the
  * SHUFFLE_HASH join strategy, and streaming simhash dedup.
  */
class SurfaceRoundtripSpec extends SparkSpec {

  test("binaryFile roundtrip: one file whose bytes reconcile with the corpus") {
    val r = CatalogQueries.binaryfileRoundtrip(spark, sf).head
    assert(r.getAs[Long]("n_files") === 1L)
    assert(r.getAs[String]("digest").length === 32)
    val expected = spark.read.parquet(s"$sf/documents.parquet")
      .agg(sum(octet_length(col("text")) + 1)).head.getLong(0)
    assert(r.getAs[Long]("total_bytes") === expected)
  }

  test("schema merge: rows double, snapshot columns null outside their snapshot") {
    val r = CatalogQueries.schemaMerge(spark, sf).head
    val n = spark.read.parquet(s"$sf/orders.parquet").count()
    assert(r.getAs[Long]("n_rows") === 2 * n)
    assert(r.getAs[Long]("n_price") === n)
    assert(r.getAs[Long]("n_cust") === n)
  }

  test("k-anonymity: class sizes partition the table, at_risk iff size < k") {
    val rows = PipelineQueries.kAnonymity(spark, sf).collect()
    val total = rows.map(_.getAs[Long]("class_size")).sum
    assert(total === spark.read.parquet(s"$sf/customer.parquet").count())
    rows.foreach { r =>
      assert((r.getAs[Int]("at_risk") === 1) === (r.getAs[Long]("class_size") < 5))
    }
  }

  test("SHUFFLE_HASH hint forces a ShuffledHashJoin in the physical plan") {
    val plan = JoinQueries.shuffleHashJoin(spark, sf)
      .asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"),
      s"expected ShuffledHashJoin in:\n$plan")
  }

  test("streaming simhash dedup: exactly one survivor per signature") {
    val rows = StreamingBridge.queries("stream_simhash_dedup")(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("n_rows") === 1L),
      "a signature surviving twice means the streaming dedup dropped state")
  }

  test("transpose: one wide row whose cells equal the segment counts") {
    val t = graft.queries.SurfaceQueries.transposeQ(spark, sf).collect()
    assert(t.length === 1)
    val row = t.head
    val segs = spark.read.parquet(s"$sf/customer.parquet")
      .groupBy("c_mktsegment").count().collect()
      .map(r => r.getAs[String]("c_mktsegment") -> r.getAs[Long]("count")).toMap
    assert(row.getAs[String]("key") === "count")
    segs.foreach { case (seg, n) => assert(row.getAs[Long](seg) === n, seg) }
    assert(row.schema.fieldNames.toSet === segs.keySet + "key")
  }

  test("execute immediate: dynamic text equals the static aggregate") {
    val dyn = graft.queries.SurfaceQueries.executeImmediate(spark, sf).collect()
    val want = spark.read.parquet(s"$sf/orders.parquet")
      .filter(col("o_orderkey") % 7 === 3)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("sum_cents"))
      .orderBy("o_orderpriority").collect()
    assert(dyn.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ===
      want.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq)
  }
}
