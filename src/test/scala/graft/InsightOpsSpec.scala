package graft

import graft.queries.InsightQueries
import org.apache.spark.sql.functions._

/** Invariant tests for the insight/report batch (InsightQueries) —
  * properties that must hold on ANY input, complementing the per-fixture
  * DuckDB oracles.
  */
class InsightOpsSpec extends SparkSpec {

  test("dataset card: totals reconcile with the raw documents table") {
    val card = InsightQueries.datasetCard(spark, sf).collect()
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    assert(card.map(_.getAs[Long]("n_docs")).sum === docs.count())
    assert(card.map(_.getAs[Long]("total_chars")).sum ===
      docs.agg(sum("n_chars")).head.getLong(0))
    card.foreach { r =>
      assert(r.getAs[Long]("dup_docs") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("top_lang_docs") >= 1L)
      val pct = r.getAs[Double]("pct_dup")
      assert(pct >= 0.0 && pct <= 1.0)
    }
  }

  test("curriculum: phases partition the corpus, phase 1 scores dominate phase 3") {
    val rows = InsightQueries.curriculum(spark, sf).collect()
    val byPhase = rows.groupBy(_.getAs[Long]("phase"))
    assert(byPhase.keySet.subsetOf(Set(1L, 2L, 3L)))
    assert(rows.length === rows.map(_.getAs[Long]("doc_id")).distinct.length)
    // phase stats columns agree with actual per-phase membership
    byPhase.foreach { case (p, rs) =>
      assert(rs.map(_.getAs[Long]("phase_docs")).distinct === Seq(rs.length.toLong))
    }
    val min1 = byPhase(1L).map(_.getAs[Double]("score")).min
    val max3 = byPhase(3L).map(_.getAs[Double]("score")).max
    assert(min1 >= max3, "tercile ordering: every phase-1 score ≥ every phase-3 score")
  }

  test("calibration bins: counts reconcile, avg_p lies inside its bin") {
    val rows = InsightQueries.calibrationBins(spark, sf).collect()
    val n = rows.map(_.getAs[Long]("n")).sum
    assert(n === spark.read.parquet(s"$sf/lineitem.parquet").count())
    rows.foreach { r =>
      val bin = r.getAs[Long]("bin")
      val avg = r.getAs[Double]("avg_p")
      assert(avg >= bin * 0.1 - 1e-6 && avg <= (bin + 1) * 0.1 + 1e-6)
      assert(r.getAs[Long]("pos") <= r.getAs[Long]("n"))
      assert(math.abs(r.getAs[Double]("gap") -
        math.abs(avg - r.getAs[Double]("frac_pos"))) < 2e-6)
    }
  }

  test("matryoshka: sims in [-1,1], agree flag consistent with ids") {
    val rows = InsightQueries.matryoshkaAgree(spark, sf).collect()
    assert(rows.length === 10)
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("sim_full")) <= 1.0 + 1e-12)
      assert(math.abs(r.getAs[Double]("sim_pre")) <= 1.0 + 1e-12)
      assert((r.getAs[Int]("agree") === 1) ===
        (r.getAs[Long]("top_full") === r.getAs[Long]("top_pre")))
    }
  }

  test("jaccard links: scores in (0,1], common bounded by degrees, no self-pairs") {
    val rows = InsightQueries.jaccardLinks(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, b) = (r.getAs[Long]("a"), r.getAs[Long]("b"))
      assert(a < b)
      val c = r.getAs[Long]("common")
      assert(c >= 1 && c <= math.min(r.getAs[Long]("deg_a"), r.getAs[Long]("deg_b")))
      val j = r.getAs[Double]("jaccard")
      assert(j > 0.0 && j <= 1.0)
    }
  }
  test("isotonic pav: monotone, block-mean-preserving, order-respecting") {
    val rows = InsightQueries.isotonicPav(spark, sf).collect()
    assert(rows.nonEmpty)
    // monotone non-decreasing in bin order
    val iso = rows.map(_.getAs[Double]("iso_rate"))
    assert(iso.zip(iso.tail).forall { case (a, b) => a <= b })
    // each maximal equal-iso run's weighted mean equals its iso value
    rows.groupBy(_.getAs[Double]("iso_rate")).foreach { case (v, rs) =>
      val n = rs.map(_.getAs[Long]("n")).sum
      val pos = rs.map(_.getAs[Long]("pos")).sum
      assert(v === pos.toDouble / n.toDouble)
      // runs are contiguous in bin order (PAV pools only adjacent bins)
      val bins = rs.map(_.getAs[Long]("bin")).sorted
      assert(bins.last - bins.head === bins.length - 1L)
    }
    rows.foreach { r =>
      assert(r.getAs[Double]("raw_rate") ===
        r.getAs[Long]("pos").toDouble / r.getAs[Long]("n").toDouble)
    }
  }
}
