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
}
