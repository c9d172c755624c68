package graft

import graft.queries.SignalQueries
import org.apache.spark.sql.functions._

/** Invariant tests for the signal batch (SignalQueries), complementing
  * the DuckDB oracles with input-independent properties: the randomized-
  * response debiasing identity, regex path reconciliation against a
  * driver-side recompute, the Holt fold against a hand-computed toy
  * series, and the weighted-median defining inequalities.
  */
class SignalOpsSpec extends SparkSpec {

  test("randomized response: debias identity and cohort totals reconcile") {
    val rows = SignalQueries.privRrEstimate(spark, sf).collect()
    val events = spark.read.parquet(s"$sf/events.parquet")
    assert(rows.map(_.getAs[Long]("n")).sum === events.count())
    val truePurch = events.filter(col("event_type") === "purchase").count()
    assert(rows.map(_.getAs[Long]("true_yes")).sum === truePurch)
    rows.foreach { r =>
      val n = r.getAs[Long]("n")
      val rep = r.getAs[Long]("reported_yes")
      assert(rep >= 0 && rep <= n)
      // est = 2*rep - n/2 exactly
      assert(r.getAs[Double]("est_yes") === 2.0 * rep - n / 2.0)
      assert(r.getAs[Double]("abs_err") ===
        math.abs(r.getAs[Double]("est_yes") - r.getAs[Long]("true_yes")))
    }
    // the estimator is debiased: summed estimate lands near the truth
    // (3-sigma of the binomial noise; sigma^2 = 3/4 * n per cohort)
    val est = rows.map(_.getAs[Double]("est_yes")).sum
    val sigma = math.sqrt(rows.map(_.getAs[Long]("n")).sum * 0.75)
    assert(math.abs(est - truePurch) <= 3 * sigma)
  }

  test("regex paths: per-user recompute of the path string agrees") {
    val got = SignalQueries.seqRegexPaths(spark, sf).collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("path_len"), r.getAs[Long]("n_conv"),
          r.getAs[Long]("max_view_run")))).toMap
    val events = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("event_type")).collect()
    val byUser = events.groupBy(_.getAs[Long]("user_id"))
    assert(got.keySet === byUser.keySet)
    byUser.foreach { case (u, rs) =>
      val path = rs.sortBy(r => (r.getAs[Long]("us"), r.getAs[Long]("event_id")))
        .map(_.getAs[String]("event_type").head).mkString
      val conv = "vc*p".r.findAllIn(path).length
      val vrun = "v+".r.findAllIn(path).map(_.length).foldLeft(0)(math.max)
      assert(got(u) === ((path.length.toLong, conv.toLong, vrun.toLong)),
        s"path stats for user $u")
    }
  }

  test("holt fold: matches the hand-computed toy recurrence") {
    // Fold [1,4,9] with alpha=.3/beta=.2: level=4.156, trend=0.5952
    // (same toy the DuckDB-side lambda was probed with). The fold under
    // test is the SHIPPED holtFoldState, not a copy — a coefficient typo
    // in the production lambda fails here.
    import spark.implicits._
    val df = Seq(Seq(1.0, 4.0, 9.0)).toDF("xs")
    val st = df.select(SignalQueries.holtFoldState(col("xs")))
      .head.getSeq[Double](0)
    assert(math.abs(st(0) - 4.156) < 1e-12)
    assert(math.abs(st(1) - 0.5952) < 1e-12)

    val rows = SignalQueries.holtTrend(spark, sf).collect()
    assert(rows.length === 5)
    rows.foreach { r =>
      assert(r.getAs[Double]("forecast") ===
        r.getAs[Double]("level") + r.getAs[Double]("trend"))
      assert(r.getAs[Long]("n_days") >= 1)
    }
  }

  test("ks test: statistic equals the driver-side CDF recompute") {
    val r = graft.queries.StatsQueries.ksTest(spark, sf).head()
    val vals = Tables.events(spark, sf)
      .filter(col("event_type").isin("click", "view"))
      .select(round(col("value") * 100).cast("long").as("v"),
        col("event_type")).collect()
    val a = vals.filter(_.getString(1) == "click").map(_.getLong(0)).sorted
    val b = vals.filter(_.getString(1) == "view").map(_.getLong(0)).sorted
    assert(r.getAs[Long]("na") === a.length.toLong)
    assert(r.getAs[Long]("nb") === b.length.toLong)
    val grid = (a ++ b).distinct.sorted
    val d = grid.map { v =>
      math.abs(a.count(_ <= v).toDouble / a.length -
        b.count(_ <= v).toDouble / b.length)
    }.max
    assert(r.getAs[Double]("d_stat") === d)
    assert(d >= 0.0 && d <= 1.0)
    assert(r.getAs[Boolean]("reject") ===
      (r.getAs[Double]("d_stat") > r.getAs[Double]("ks_crit")))
  }

  test("weighted median: defining inequalities hold per group") {
    val rows = SignalQueries.weightedMedian(spark, sf).collect()
    val base = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_returnflag").as("rf"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"),
        round(col("l_quantity")).cast("long").as("q")).collect()
      .groupBy(_.getAs[String]("rf"))
    assert(rows.map(_.getAs[String]("l_returnflag")).toSet === base.keySet)
    rows.foreach { r =>
      val rf = r.getAs[String]("l_returnflag")
      val m = r.getAs[Long]("wmedian_cents")
      val grp = base(rf).map(x => (x.getAs[Long]("cents"), x.getAs[Long]("q")))
      val tot = grp.map(_._2).sum
      assert(r.getAs[Long]("tot_w") === tot)
      // weight at or below the median reaches half; strictly below does not
      val wLe = grp.filter(_._1 <= m).map(_._2).sum
      val wLt = grp.filter(_._1 < m).map(_._2).sum
      assert(2 * wLe >= tot, s"median too small for $rf")
      assert(2 * wLt < tot, s"median not minimal for $rf")
    }
  }
}
