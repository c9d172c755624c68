package graft

import graft.queries.{BenfordConstants, FrontierQueries}
import org.apache.spark.sql.functions._

/** Invariant tests for the frontier batch (FrontierQueries) — properties
  * that must hold on ANY input, complementing the per-fixture DuckDB
  * oracles: reconciliation against the raw tables (XML/script), the
  * defining algebraic identities (chi-square marginals, the KM product,
  * the ALS normal equations), and an independent brute-force recompute of
  * the grid spatial join.
  */
class FrontierOpsSpec extends SparkSpec {

  test("xml roundtrip: segment totals reconcile with the raw customer table") {
    val got = FrontierQueries.xmlRoundtrip(spark, sf).collect()
    val raw = spark.read.parquet(s"$sf/customer.parquet")
    assert(got.map(_.getAs[Long]("n")).sum === raw.count())
    val wantCents = raw
      .agg(sum(round(col("c_acctbal") * 100).cast("long"))).head.getLong(0)
    assert(got.map(_.getAs[Long]("sum_cents")).sum === wantCents)
    assert(got.map(_.getAs[String]("c_mktsegment")).distinct.length === got.length)
  }

  test("sql script: loop accumulators equal the direct aggregate") {
    val row = FrontierQueries.sqlScript(spark, sf).head()
    val want = spark.read.parquet(s"$sf/orders.parquet")
      .agg(count(lit(1)),
        sum(round(col("o_totalprice") * 100).cast("long"))).head
    assert(row.getAs[Long]("n_orders") === want.getLong(0))
    assert(row.getAs[Long]("sum_cents") === want.getLong(1))
    assert(row.getAs[Int]("n_chunks") === 5)
    assert(row.getAs[String]("size_label") ===
      (if (want.getLong(0) > 1000) "large" else "small"))
  }

  test("chi2: marginal identities hold and the statistic is the contrib sum") {
    val rows = FrontierQueries.chi2Test(spark, sf).collect()
    val n = rows.map(_.getAs[Long]("o")).sum
    // expected counts preserve the grand total
    assert(math.abs(rows.map(_.getAs[Double]("e")).sum - n.toDouble) < 1e-6)
    // expected counts preserve every row marginal
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (_, rs) =>
      val o = rs.map(_.getAs[Long]("o")).sum.toDouble
      assert(math.abs(rs.map(_.getAs[Double]("e")).sum - o) < 1e-6)
    }
    val chi2 = rows.head.getAs[Double]("chi2")
    assert(rows.forall(r => r.getAs[Double]("chi2") === chi2))
    assert(math.abs(chi2 - rows.map(_.getAs[Double]("contrib")).sum) < 1e-9)
    assert(chi2 >= 0.0)
  }

  test("benford: observed fractions sum to 1, reference column matches the constants") {
    val rows = FrontierQueries.benford(spark, sf).collect()
    assert(math.abs(rows.map(_.getAs[Double]("obs_frac")).sum - 1.0) < 1e-12)
    rows.foreach { r =>
      val d = r.getAs[Int]("digit")
      assert(d >= 1 && d <= 9)
      assert(r.getAs[Double]("benford_frac") === BenfordConstants.log10Frac(d))
      assert(math.abs(r.getAs[Double]("abs_dev") -
        math.abs(r.getAs[Double]("obs_frac") - r.getAs[Double]("benford_frac"))) < 1e-15)
    }
  }

  test("kaplan-meier: at-risk shrinks, survival is the running product in (0,1]") {
    val rows = FrontierQueries.kaplanMeier(spark, sf).collect()
    assert(rows.nonEmpty)
    var prevT = Long.MinValue
    var prevRisk = Long.MaxValue
    var prod = 1.0
    rows.foreach { r =>
      val t = r.getAs[Long]("t_h")
      val nRisk = r.getAs[Long]("n_risk")
      val d = r.getAs[Long]("d")
      assert(t > prevT); prevT = t
      assert(nRisk <= prevRisk); prevRisk = nRisk
      assert(d >= 1 && d <= nRisk)
      assert(r.getAs[Long]("c") >= 0)
      prod *= (nRisk - d).toDouble / nRisk.toDouble
      assert(r.getAs[Double]("survival") === prod)
    }
    assert(prod >= 0.0 && prod < 1.0)
  }

  test("geo grid join equals the brute-force quadratic recompute") {
    import spark.implicits._
    val got = FrontierQueries.geoGridNeighbors(spark, sf).collect()
      .map(r => (r.getAs[Long]("custkey"),
        (r.getAs[Long]("n_neighbors"),
          Option(r.getAs[java.lang.Long]("min_d2")).map(_.toLong))))
      .toMap
    val pts = got.keys.toSeq.sorted.map { k =>
      // reproduce the deterministic coordinates straight from the hash
      val x = FrontierQueriesTestHash.ihash31(s"$k|x") % 1000000L
      val y = FrontierQueriesTestHash.ihash31(s"$k|y") % 1000000L
      (k, x, y)
    }
    // every sampled customer must appear exactly once
    val sampled = spark.read.parquet(s"$sf/customer.parquet")
      .filter(col("c_custkey") % 3 === 0).select("c_custkey")
      .as[Long].collect().sorted.toSeq
    assert(got.keys.toSeq.sorted === sampled)
    pts.foreach { case (k, x, y) =>
      val d2s = for {
        (k2, x2, y2) <- pts if k2 != k
        d2 = (x - x2) * (x - x2) + (y - y2) * (y - y2) if d2 <= 625000000L
      } yield d2
      val (gn, gm) = got(k)
      assert(gn === d2s.length.toLong, s"neighbor count for $k")
      assert(gm === (if (d2s.isEmpty) None else Some(d2s.min)), s"min_d2 for $k")
    }
  }

  test("als step: emitted factors satisfy the ridge normal equations") {
    val theta = FrontierQueries.alsStep(spark, sf)
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val od = spark.read.parquet(s"$sf/orders.parquet")
    val sums = li
      .select(col("l_orderkey"), round(col("l_quantity")).cast("long").as("r"),
        (graft.plans.Fnv1a64.ihash31(
          concat(col("l_partkey").cast("string"), lit("|f1"))) % 7L - 3L).as("q1"),
        (graft.plans.Fnv1a64.ihash31(
          concat(col("l_partkey").cast("string"), lit("|f2"))) % 7L - 3L).as("q2"))
      .join(od.select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey").as("custkey"))
      .agg(sum(col("q1") * col("q1")).as("s11"), sum(col("q1") * col("q2")).as("s12"),
        sum(col("q2") * col("q2")).as("s22"), sum(col("r") * col("q1")).as("b1"),
        sum(col("r") * col("q2")).as("b2"))
    val joined = theta.join(sums, "custkey").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (s11, s12, s22) = (r.getAs[Long]("s11"), r.getAs[Long]("s12"),
        r.getAs[Long]("s22"))
      val (b1, b2) = (r.getAs[Long]("b1"), r.getAs[Long]("b2"))
      val (t1, t2) = (r.getAs[Double]("theta1"), r.getAs[Double]("theta2"))
      // (A + 100 I) theta = b, the defining property of the solve —
      // independent of the Cramer's-rule form the query used to get there
      assert(math.abs((s11 + 100L) * t1 + s12 * t2 - b1) < 1e-6,
        s"normal eq 1 for ${r.getAs[Long]("custkey")}")
      assert(math.abs(s12 * t1 + (s22 + 100L) * t2 - b2) < 1e-6,
        s"normal eq 2 for ${r.getAs[Long]("custkey")}")
    }
  }
}

/** Driver-side FNV-1a reimplementation for the brute-force geo recompute —
  * deliberately independent of the Catalyst expression under test. */
object FrontierQueriesTestHash {
  def ihash31(s: String): Long = {
    var h = -3750763034362895579L // 14695981039346656037 as signed
    s.getBytes("UTF-8").foreach { b =>
      h = (h ^ (b & 0xffL)) * 1099511628211L
    }
    h & 0x7fffffffL
  }
}
