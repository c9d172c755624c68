package graft

import graft.queries.{CatalogQueries, MultimodalQueries, StreamingBridge, TextQueries}
import org.apache.spark.sql.functions._

/** Invariant + plan-pin tests for the sixteenth batch: event-time timers,
  * lang-ID confusion, cached scan, malformed CSV modes, multimodal
  * pairing.
  */
class TimerOpsSpec extends SparkSpec {

  test("tws timers: every user fires exactly once with their full count") {
    val rows = StreamingBridge.queries("stream_tws_timers")(spark, sf).collect()
    val users = spark.read.parquet(s"$sf/events.parquet")
      .select("user_id").distinct().count()
    assert(rows.length.toLong === users, "one timer emission per key")
    assert(rows.map(_.getAs[Long]("timer_ms")).distinct.toSeq ===
      Seq(1706140800000L))
    assert(rows.map(_.getAs[Long]("n_events")).sum ===
      spark.read.parquet(s"$sf/events.parquet").count())
  }

  test("langid confusion: rates sum to 1 per labeled language") {
    val rows = TextQueries.langIdConfusion(spark, sf).collect()
    rows.groupBy(_.getAs[String]("lang")).foreach { case (_, rs) =>
      val total = rs.head.getAs[Long]("lang_total")
      assert(rs.map(_.getAs[Long]("n")).sum === total)
      assert(math.abs(rs.map(_.getAs[Double]("rate")).sum - 1.0) < 1e-4)
    }
  }

  test("cached scan reads through an InMemoryTableScan") {
    val df = CatalogQueries.cachedScan(spark, sf)
    val plan = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.executedPlan.toString
    assert(plan.contains("InMemoryTableScan"), s"expected cache scan in:\n$plan")
    assert(df.count() > 0)
    spark.sharedState.cacheManager.clearCache()
  }

  test("csv malformed: permissive and drop modes agree on the clean rows") {
    val r = CatalogQueries.csvMalformed(spark, sf).head
    val n = spark.read.parquet(s"$sf/nation.parquet").count()
    assert(r.getAs[Long]("n_good") === n)
    assert(r.getAs[Long]("n_corrupt") === 3L)
    assert(r.getAs[Long]("n_total") === n + 3)
    // pinned asymmetry: the under-length row survives DROPMALFORMED
    assert(r.getAs[Long]("n_dropmode") === n + 1)
  }

  test("multimodal pairing: every embedding with a media partner is paired") {
    val rows = MultimodalQueries.pairEmbed(spark, sf).collect()
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id").as("id"))
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id").as("id"))
    val expected = emb.join(docs, "id").count()
    assert(rows.map(_.getAs[Long]("n_pairs")).sum === expected)
    rows.foreach(r => assert(r.getAs[Double]("avg_norm") > 0))
  }
}
