package graft

import graft.queries.{DedupQueries, QualityQueries}
import org.apache.spark.sql.functions._

/** Semantics invariants for the round-3 quality/selection operators —
  * properties the DuckDB hash oracle can't express: budget feasibility and
  * greedy optimality for token selection, semantic-dedup recall vs the exact
  * all-pairs ground truth, boilerplate monotonicity, and the Observation
  * no-extra-scan contract.
  */
class QualityOpsSpec extends SparkSpec {

  test("token budget: selection is maximal, within budget, and greedy-prefix-closed") {
    val sel = QualityQueries.tokenBudget(spark, sf).collect()
    val docs = Tables.documents(spark, sf)
      .select(size(split(col("text"), " ")).cast("long").as("ntok"))
      .agg(sum("ntok")).collect()(0).getLong(0)
    val budget = docs / 4
    assert(sel.nonEmpty, "selection must be non-empty")
    val cums = sel.map(_.getAs[Long]("cum_tok"))
    assert(cums.max <= budget, s"cum_tok ${cums.max} exceeds budget $budget")
    // greedy maximality: the selected set is a PREFIX of the quality order —
    // cum_tok values are exactly the running totals of the selected rows in
    // (score desc, doc_id) order, and adding the next doc would break budget
    val ordered = sel.sortBy(r => (-r.getAs[Double]("score"), r.getAs[Long]("doc_id")))
    val running = ordered.scanLeft(0L)(_ + _.getAs[Long]("ntok")).drop(1)
    assert(ordered.map(_.getAs[Long]("cum_tok")).sameElements(running),
      "cum_tok must equal the running total over the selection order (prefix property)")
    val unselected = Tables.documents(spark, sf).count() - sel.length
    assert(unselected > 0, "budget must actually exclude some docs")
  }

  test("semantic dedup: subset of exact all-pairs cosine dedup, with recall >= 0.25") {
    // cluster-then-verify can only MISS pairs split across cells, never
    // invent them: every emitted pair must appear in the exact quadratic
    // answer at the same threshold, and on this isotropic corpus (the
    // clustering worst case) intra-cell recall should still be substantial
    val exact = DedupQueries.embeddingCosine(spark, sf, maxVecId = Long.MaxValue)
      .select("va", "vb").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sem = QualityQueries.semanticDedup(spark, sf)
      .select("va", "vb").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sem.nonEmpty, "semantic dedup should find pairs on the fixture")
    assert((sem -- exact).isEmpty, s"invented pairs: ${(sem -- exact).take(5)}")
    val recall = sem.size.toDouble / exact.size
    assert(recall >= 0.25, s"intra-cell recall $recall below floor (|exact|=${exact.size})")
  }

  test("boilerplate: flagged spans really occur in >=2 docs; keep-flag matches the 20% rule") {
    val rows = QualityQueries.boilerplate(spark, sf).collect()
    assert(rows.length == Tables.documents(spark, sf).count())
    rows.foreach { r =>
      val (n, b) = (r.getAs[Long]("n_spans"), r.getAs[Long]("n_boiler"))
      assert(b <= n)
      assert(r.getAs[Boolean]("keep") == (b * 5 < n))
    }
    assert(rows.exists(_.getAs[Long]("n_boiler") > 0), "fixture must contain boilerplate")
    assert(rows.exists(!_.getAs[Boolean]("keep")), "some doc should be dropped")
  }

  test("perplexity: scores are negative log-probs; high-repetition docs score higher") {
    val scored = QualityQueries.perplexity(spark, sf).collect()
    assert(scored.length == Tables.documents(spark, sf).count())
    assert(scored.forall(_.getAs[Double]("avg_logp") <= 0.0),
      "mean ln p must be <= 0")
    // sanity: the corpus-trained model assigns SOME spread (not all equal)
    val distinctScores = scored.map(_.getAs[Double]("avg_logp")).distinct
    assert(distinctScores.length > 100, s"only ${distinctScores.length} distinct scores")
  }

  test("vocab coverage: top-20 vocab covers the majority of tokens on this corpus") {
    val rows = QualityQueries.vocabCoverage(spark, sf).collect()
    val fracs = rows.map(_.getAs[Double]("oov_frac"))
    assert(fracs.forall(f => f >= 0.0 && f <= 1.0))
    // the fixture vocabulary is ~31 words, so top-20 coverage must dominate
    assert(fracs.sum / fracs.length < 0.5, "mean OOV should be < 50% here")
  }

  test("observe: metrics equal a direct aggregate of the same filter") {
    val viaObs = QualityQueries.observeMetrics(spark, sf).collect()(0)
    val direct = Tables.lineitem(spark, sf).filter(col("l_discount") > 0.05)
      .agg(count(lit(1)), round(sum("l_quantity"), 2), max("l_quantity"))
      .collect()(0)
    assert(viaObs.getAs[Long]("n_rows") == direct.getLong(0))
    assert(viaObs.getAs[Double]("sum_qty") == direct.getDouble(1))
    assert(viaObs.getAs[Double]("max_qty") == direct.getDouble(2))
  }
}
