package graft

import graft.queries.{DedupQueries, ExperimentQueries, FunctionQueries2, SimilarityQueries, StreamingBridge}
import org.apache.spark.sql.functions._

/** Invariant tests for the thirteenth batch: containment dedup, sparse
  * TF-IDF k-NN, rolling regression slope, ListState streaming top-k, and
  * outer-generator semantics.
  */
class SparseOpsSpec extends SparkSpec {

  test("containment: both containments bound jaccard and sit in (0,1]") {
    val rows = DedupQueries.containmentPairs(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (ab, ba, j) = (r.getAs[Double]("cont_ab"), r.getAs[Double]("cont_ba"),
        r.getAs[Double]("jac"))
      assert(math.max(ab, ba) >= 0.9)
      assert(j <= math.min(ab, ba) + 1e-12, "jaccard never exceeds either containment")
      assert(ab > 0 && ab <= 1.0 + 1e-12 && ba > 0 && ba <= 1.0 + 1e-12)
      assert(r.getAs[Long]("n_inter") <=
        math.min(r.getAs[Long]("na"), r.getAs[Long]("nb")))
    }
  }

  test("sparse knn: full ranking per query, cosines in (0,1], ranks contiguous") {
    val rows = SimilarityQueries.sparseKnn(spark, sf).collect()
    assert(rows.length === 50, "10 queries x k=5")
    rows.groupBy(_.getAs[Long]("qid")).foreach { case (_, rs) =>
      val ranks = rs.map(_.getAs[Int]("rank")).sorted
      assert(ranks === (1 to 5).toArray.toSeq)
      val sims = rs.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("cos"))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
      sims.foreach(c => assert(c > 0 && c <= 1.0 + 1e-9))
    }
  }

  test("sparse knn: index terms are fused gram hashes, never gram strings") {
    // the r6 scale fix — the inverted-index shuffles must carry the native
    // word_gram_fnv longs; a regression back to concat'd bigram strings
    // (41.4 s at sf1 vs 8.6 fused) would reappear here before any bench
    val plan = SimilarityQueries.sparseKnn(spark, sf)
      .asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.executedPlan.toString
    assert(plan.contains("word_gram_fnv"), "fused gram-hash expression missing")
    assert(!plan.contains("concat_ws"), "gram strings materialized in the plan")
  }

  test("rolling slope: one row per event, degenerate windows are NULL") {
    val df = ExperimentQueries.rollingSlope(spark, sf)
    val n = spark.read.parquet(s"$sf/events.parquet").count()
    assert(df.count() === n)
    // single-row windows can have no slope
    assert(df.filter(col("n_w") === 1 && col("slope").isNotNull).count() === 0L)
  }

  test("streaming topk state: per-user ranks contiguous, values descending") {
    val rows = StreamingBridge.queries("stream_topk_state")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("user_id")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Int]("rank")).toSeq === (1 to sorted.length))
      val vals = sorted.map(_.getAs[Long]("value_c"))
      assert(vals.zip(vals.tail).forall { case (a, b) => a >= b })
    }
  }

  test("explode_outer: every document survives, empty lists yield null rows") {
    val rows = FunctionQueries2.explodeOuter(spark, sf)
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.select("doc_id").distinct().count() === nDocs)
    val nullRows = rows.filter(col("tok").isNull)
    assert(nullRows.count() > 0, "fixture must exercise the empty-array branch")
    assert(nullRows.filter(col("pos").isNotNull).count() === 0L)
  }
}
