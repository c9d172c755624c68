package graft

import graft.queries.{AnalyticsQueries, DedupQueries, MiningQueries, MlQueries2}
import org.apache.spark.sql.functions._

/** Invariant tests for the fourteenth batch: exact AUC, community
  * modularity, activity streaks, conversion latency, and the dedup
  * threshold curve.
  */
class MetricsOpsSpec extends SparkSpec {

  test("exact AUC: population reconciles and the score is a probability") {
    val r = MlQueries2.aucExact(spark, sf).head
    val n = spark.read.parquet(s"$sf/lineitem.parquet").count()
    assert(r.getAs[Long]("p_total") + r.getAs[Long]("n_total") === n)
    val auc = r.getAs[Double]("auc")
    assert(auc >= 0.0 && auc <= 1.0)
    // the fixture's features are independent of the label by construction,
    // so the exact rank-sum must land near 0.5 — far-off means a rank bug
    assert(math.abs(auc - 0.5) < 0.1, s"independent features => AUC~0.5, got $auc")
  }

  test("modularity: vertices reconcile with LPA labeling, Q in range") {
    val rows = MiningQueries.modularity(spark, sf).collect()
    val nVtx = MiningQueries.labelPropagation(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_vertices")).sum === nVtx)
    val q = rows.map(_.getAs[Double]("q_contrib")).sum
    // the bipartite random fixture has no real community structure, so Q
    // may be negative; the invariant is the modularity RANGE, not its sign
    assert(q >= -1.0 && q <= 1.0, s"modularity out of range: Q=$q")
    rows.foreach(r => assert(r.getAs[Long]("intra2") % 2 === 0,
      "both edge directions counted: intra2 must be even"))
  }

  test("streaks: longest bounded by active days, totals reconcile") {
    val rows = AnalyticsQueries.streaks(spark, sf).collect()
    val activeTotal = spark.read.parquet(s"$sf/events.parquet")
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct().count()
    assert(rows.map(_.getAs[Long]("active_days")).sum === activeTotal)
    rows.foreach { r =>
      assert(r.getAs[Long]("longest_streak") <= r.getAs[Long]("active_days"))
      assert(r.getAs[Long]("n_streaks") >= 1L)
    }
  }

  test("conversion latency: purchase never precedes the first view") {
    val rows = AnalyticsQueries.conversionLatency(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("latency_us") >= 0L)
      assert(r.getAs[Long]("first_purch_us") - r.getAs[Long]("first_view_us")
        === r.getAs[Long]("latency_us"))
    }
  }

  test("threshold curve: monotone, anchored to the 0.8 jaccard pair count") {
    val rows = DedupQueries.thresholdCurve(spark, sf).collect()
      .sortBy(_.getAs[Double]("threshold"))
    assert(rows.length === 10)
    val counts = rows.map(_.getAs[Long]("n_pairs"))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b },
      "raising the threshold can only shrink the pair set")
    rows.foreach(r => assert(r.getAs[Long]("n_pairs") <= r.getAs[Long]("n_candidates")))
    val at08 = rows.find(r => math.abs(r.getAs[Double]("threshold") - 0.8) < 1e-9).get
    assert(at08.getAs[Long]("n_pairs") === DedupQueries.ngramJaccard(spark, sf).count())
  }
}
