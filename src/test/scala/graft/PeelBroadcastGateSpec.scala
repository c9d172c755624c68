package graft

import graft.queries.GraphQueries
import org.apache.spark.sql.functions._

/** Stats-gated broadcast-vs-shuffle selection for the triangle/peel
  * family's closing-edge joins (r9, verdict #1 — the AsOfJoinStrategy
  * two-variant precedent at the DataFrame layer): the broadcast must be a
  * measured-size DECISION, not an assumption. Pins (a) both physical
  * paths produce identical answers on the fixtures, (b) the plans really
  * differ (broadcast join present vs absent), and (c) the gate flips at a
  * forced threshold.
  */
class PeelBroadcastGateSpec extends SparkSpec {

  /** Set confs for the duration of `f`, restoring previous values after —
    * the peel builders make their broadcast decision eagerly inside the
    * builder, so the conf must wrap the BUILD, and the un-hinted variant
    * additionally needs Spark's own auto-broadcast off at EXECUTION for
    * the shuffle path to be genuinely exercised.
    */
  private def withConf[T](pairs: (String, String)*)(f: => T): T = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  private val shufflePathConfs = Seq(
    GraphQueries.BroadcastEdgeLimitKey -> "0",
    "spark.sql.autoBroadcastJoinThreshold" -> "-1")

  test("edgesFitBroadcast flips at a forced threshold") {
    assert(GraphQueries.edgesFitBroadcast(spark, 1000L),
      "fixture-sized edge sets must fit the default budget")
    assert(GraphQueries.edgesFitBroadcast(spark,
      GraphQueries.BroadcastEdgeLimitDefault),
      "the budget is inclusive at the limit")
    assert(!GraphQueries.edgesFitBroadcast(spark,
      GraphQueries.BroadcastEdgeLimitDefault + 1),
      "one row past the budget must NOT broadcast")
    withConf(GraphQueries.BroadcastEdgeLimitKey -> "0") {
      assert(!GraphQueries.edgesFitBroadcast(spark, 1L),
        "a forced zero budget must route every size to the shuffle path")
    }
    withConf(GraphQueries.BroadcastEdgeLimitKey -> "10000000000") {
      assert(GraphQueries.edgesFitBroadcast(spark, 6000000L),
        "a raised budget must admit larger sets")
    }
  }

  test("closedTriangles: broadcast and shuffle variants produce different plans, same rows") {
    import spark.implicits._
    // K5 on {1..5} plus a pendant chain — rich enough that the closing
    // join has real work on both paths
    val edges = (for {
      u <- 1L to 5L; v <- (u + 1) to 5L
    } yield (u, v)) ++ Seq((5L, 6L), (6L, 7L))
    val eo = GraphQueries.orientByDegree(edges.toDF("u", "v"))
      .localCheckpoint(false)

    val bc = GraphQueries.closedTriangles(eo, broadcastClose = true)
    val bcRows = bc.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(bc.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
      "the hinted variant must plan a broadcast join")

    withConf(shufflePathConfs: _*) {
      val sh = GraphQueries.closedTriangles(eo, broadcastClose = false)
      val shRows = sh.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
      assert(!sh.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
        "the un-hinted variant with auto-broadcast off must shuffle every join")
      assert(shRows === bcRows, "both physical paths must close the same triangles")
    }
    assert(bcRows.size === 10 + 0, "K5 closes C(5,3)=10 triangles, the chain none")
  }

  test("graph_ktruss: forced shuffle path equals the default broadcast path (fixture)") {
    val want = GraphQueries.ktruss(spark, sf, 8, 8).collect()
      .map(r => (r.getAs[Int]("round"), r.getAs[Long]("n_edges"))).toSeq
    val got = withConf(shufflePathConfs: _*) {
      GraphQueries.ktruss(spark, sf, 8, 8).collect()
        .map(r => (r.getAs[Int]("round"), r.getAs[Long]("n_edges"))).toSeq
    }
    assert(got === want, "peel curve must be identical on both physical paths")
  }

  test("graph_clustering and graph_triangles: forced shuffle path equals the default path (fixture)") {
    val wantCc = GraphQueries.clusteringCoeff(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    val wantTri = GraphQueries.triangles(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val (gotCc, gotTri) = withConf(shufflePathConfs: _*) {
      (GraphQueries.clusteringCoeff(spark, sf).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq,
       GraphQueries.triangles(spark, sf).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq)
    }
    assert(gotCc === wantCc, "clustering coefficients must match on both paths")
    assert(gotTri === wantTri, "triangle counts must match on both paths")
  }
}
