package graft

import graft.queries.{CurationQueries, EventQueries, FunctionQueries2, MlQueries2}
import org.apache.spark.sql.functions._

/** Invariant tests for the seventeenth batch: DPO preference pairs,
  * k-fold AUC, map HOFs, multi-agg pivot, row-level CSV codec.
  */
class PreferenceOpsSpec extends SparkSpec {

  test("dpo pairs: at most one pair per source, chosen strictly dominates") {
    val rows = CurationQueries.dpoPairs(spark, sf).collect()
    val nSources = spark.read.parquet(s"$sf/documents.parquet")
      .select("source").distinct().count()
    // degenerate self-pairs (single-doc sources) are filtered, so ≤ 1 per
    // source — and the fixture must leave at least one real pair, or the
    // dominance assertions below are vacuous
    assert(rows.length.toLong <= nSources)
    assert(rows.nonEmpty, "no usable preference pair on the fixture")
    assert(rows.map(_.getAs[String]("source")).distinct.length === rows.length)
    rows.foreach { r =>
      assert(r.getAs[Long]("chosen_doc") != r.getAs[Long]("rejected_doc"))
      assert(r.getAs[Double]("chosen_score") >= r.getAs[Double]("rejected_score"))
      assert(r.getAs[Double]("margin") >= 0.0)
    }
  }

  test("kfold auc: folds partition the rows, each AUC is a probability") {
    val rows = MlQueries2.kfoldAuc(spark, sf).collect()
    assert(rows.length === 3)
    val n = rows.map(r => r.getAs[Long]("p_total") + r.getAs[Long]("n_total")).sum
    assert(n === spark.read.parquet(s"$sf/lineitem.parquet").count())
    rows.foreach { r =>
      val auc = r.getAs[Double]("auc")
      assert(auc >= 0.0 && auc <= 1.0)
    }
  }

  test("map hof: survivors are exactly the >=4-count cells, doubled") {
    val rows = FunctionQueries2.mapHof(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val v = r.getAs[Long]("doubled")
      assert(v >= 8 && v % 2 === 0)
    }
  }

  test("pivot multi-agg: per-cohort counts reconcile with the row total") {
    val rows = EventQueries.pivotMultiAgg(spark, sf).collect()
    val total = rows.map { r =>
      Seq("click", "error", "purchase", "signup", "view")
        .map(t => r.getAs[Long](s"${t}_n")).sum
    }.sum
    assert(total === spark.read.parquet(s"$sf/events.parquet").count())
  }

  test("csv expr: lossless roundtrip for every row") {
    val r = FunctionQueries2.csvExpr(spark, sf).head
    assert(r.getAs[Long]("n_ok") === r.getAs[Long]("n_rows"))
    assert(r.getAs[String]("min_line").split(",").length === 3)
  }
}
