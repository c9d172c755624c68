package graft

import graft.queries.{DedupQueries, QualityQueries, SimilarityQueries}

/** Stats-gated broadcast-vs-shuffle selection for the embedding
  * near-dup verifiers' vector-table joins (r9 — the PeelBroadcastGateSpec
  * sibling): `dedup_semantic` and `dedup_embedding_lsh` join a huge
  * generated candidate-pair stream back to the vector table by id, and
  * the broadcast of the (provably small at fixture decades) vector table
  * must be a measured-count DECISION — Catalyst's own estimate for the
  * pair stream descends from a cells-sized aggregate and mis-plans a
  * pair-stream sort-merge join past the auto-broadcast threshold
  * (observed at sf10: a 2.5e9-row pair exchange). Pins (a) the gate
  * flips at a forced threshold, (b) both physical paths produce
  * identical answers, (c) the plans genuinely differ.
  */
class VecBroadcastGateSpec extends SparkSpec {

  private def withConf[T](pairs: (String, String)*)(f: => T): T = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  private val shufflePathConfs = Seq(
    SimilarityQueries.BroadcastVecLimitKey -> "0",
    "spark.sql.autoBroadcastJoinThreshold" -> "-1")

  test("vecsFitBroadcast flips at a forced threshold") {
    assert(SimilarityQueries.vecsFitBroadcast(spark, 1000L),
      "fixture-sized vector tables must fit the default budget")
    assert(SimilarityQueries.vecsFitBroadcast(spark,
      SimilarityQueries.BroadcastVecLimitDefault),
      "the budget is inclusive at the limit")
    assert(!SimilarityQueries.vecsFitBroadcast(spark,
      SimilarityQueries.BroadcastVecLimitDefault + 1),
      "one row past the budget must NOT broadcast")
    withConf(SimilarityQueries.BroadcastVecLimitKey -> "0") {
      assert(!SimilarityQueries.vecsFitBroadcast(spark, 1L),
        "a forced zero budget must route every size to the shuffle path")
    }
  }

  test("dedup_semantic: forced shuffle path equals the default broadcast path") {
    val want = QualityQueries.semanticDedup(spark, sf)
    assert(want.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
      "the fixture-scale default must broadcast the vector table")
    val wantRows = want.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val gotRows = withConf(shufflePathConfs: _*) {
      val got = QualityQueries.semanticDedup(spark, sf)
      assert(!got.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
        "the forced path with auto-broadcast off must shuffle every join")
      got.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    }
    assert(gotRows === wantRows,
      "both physical paths must verify the same near-dup pairs")
  }

  test("dedup_embedding_lsh: forced shuffle path equals the default broadcast path") {
    val want = DedupQueries.embeddingLsh(spark, sf)
    assert(want.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
      "the fixture-scale default must broadcast the vector table")
    val wantRows = want.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val gotRows = withConf(shufflePathConfs: _*) {
      val got = DedupQueries.embeddingLsh(spark, sf)
      assert(!got.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
        "the forced path with auto-broadcast off must shuffle every join")
      got.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    }
    assert(gotRows === wantRows,
      "both physical paths must verify the same near-dup pairs")
  }
}
