package graft

import graft.queries.{EventQueries, MiningQueries, MixQueries, PipelineQueries, ScaleQueries}
import org.apache.spark.sql.functions._

/** Invariant tests for the eighteenth batch: RLE encoding stats, degree
  * assortativity, embedding drift, gate bitmask histogram, daily growth.
  */
class DriftOpsSpec extends SparkSpec {

  test("encoding stats: runs bounded by rows, run length >= 1") {
    val rows = ScaleQueries.encodingStats(spark, sf).collect()
    assert(rows.length === 3)
    rows.foreach { r =>
      val (runs, n) = (r.getAs[Long]("n_runs"), r.getAs[Long]("n_rows"))
      assert(runs >= 1 && runs <= n)
      assert(r.getAs[Double]("avg_run_len") >= 1.0)
    }
  }

  test("assortativity: r in [-1,1], symmetric sums agree") {
    val r = MiningQueries.assortativity(spark, sf).head
    val cc = r.getAs[Double]("r")
    assert(cc >= -1.0 && cc <= 1.0)
    // both directions present → Σdx over edges equals Σdy (printed as sx/sxy
    // with syy/sxx symmetric)
    assert(r.getAs[Long]("sxx") === r.getAs[Long]("syy"))
    // bipartite part-supplier graph: hubs attach to the other side's leaves
    assert(cc < 0.5)
  }

  test("embedding drift: 64 dims, cohorts partition the corpus") {
    val rows = MixQueries.embDrift(spark, sf).collect()
    assert(rows.length === 64)
    val n = spark.read.parquet(s"$sf/embeddings.parquet").count()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_a") + r.getAs[Long]("n_b") === n)
      assert(r.getAs[Double]("shift") >= 0.0)
    }
  }

  test("gate bitmask: histogram covers all docs, flags decode the mask") {
    val rows = PipelineQueries.gateBitmask(spark, sf).collect()
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum === nDocs)
    rows.foreach { r =>
      val m = r.getAs[Long]("mask")
      assert(m >= 0 && m <= 15)
      assert(r.getAs[Int]("passed_len") === (if ((m & 1) > 0) 1 else 0))
      assert(r.getAs[Int]("passed_rep") === (if ((m & 8) > 0) 1 else 0))
    }
  }

  test("daily growth: deltas reconcile with consecutive totals") {
    val rows = EventQueries.dailyGrowth(spark, sf).collect()
    rows.filter(_.getAs[Any]("prev_c") != null).foreach { r =>
      assert(r.getAs[Long]("delta_c") ===
        r.getAs[Long]("total_c") - r.getAs[Long]("prev_c"))
    }
    // exactly one null-prev row per event type (the first day)
    val nTypes = rows.map(_.getAs[String]("event_type")).distinct.length
    assert(rows.count(_.getAs[Any]("prev_c") == null) === nTypes)
  }
}
