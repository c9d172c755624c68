package graft

import graft.queries.GraphQueries
import org.apache.spark.sql.functions._

/** k-truss peel: the per-round edge-count curve is recomputed driver-side
  * with an independent adjacency-set peel over the real fixture, and the
  * support rule is pinned on a planted graph (a K4 survives the 4-truss
  * peel; a triangle hanging off it, and its pendant edge, do not).
  */
class KTrussSpec extends SparkSpec {

  private def peelCurve(edges0: Set[(Long, Long)], k: Int, rounds: Int): Seq[(Int, Long)] = {
    var edges = edges0
    (1 to rounds).map { r =>
      val adj = (edges.toSeq.flatMap { case (u, v) => Seq(u -> v, v -> u) })
        .groupBy(_._1).map { case (x, ys) => x -> ys.map(_._2).toSet }
      edges = edges.filter { case (u, v) =>
        (adj(u) intersect adj(v)).size >= k - 2
      }
      (r, edges.size.toLong)
    }
  }

  test("peel curve equals the independent adjacency-set peel (two SFs)") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val li = spark.read.parquet(s"$dir/lineitem.parquet")
        .filter(col("l_orderkey") % 2 === 0)
        .select(col("l_orderkey"), col("l_partkey"))
      val edges = li.as("a").join(li.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
        .distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = peelCurve(edges, 8, 8)
      val got = GraphQueries.ktruss(spark, dir, 8, 8).collect()
        .map(r => (r.getAs[Int]("round"), r.getAs[Long]("n_edges"))).toSeq
      assert(got === want, s"peel curve mismatch at $dir")
      assert(got.map(_._2) === got.map(_._2).sorted.reverse, "curve must be non-increasing")
    }
  }

  test("clustering coefficients equal the driver-side neighborhood count (two SFs)") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val li = spark.read.parquet(s"$dir/lineitem.parquet")
        .filter(col("l_orderkey") % 2 === 0)
        .select(col("l_orderkey"), col("l_partkey"))
      val edges = li.as("a").join(li.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
        .distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val adj = edges.toSeq.flatMap { case (u, v) => Seq(u -> v, v -> u) }
        .groupBy(_._1).map { case (x, ys) => x -> ys.map(_._2).toSet }
      val got = GraphQueries.clusteringCoeff(spark, dir).collect()
        .map(r => (r.getAs[Long]("vtx"),
          (r.getAs[Long]("deg"), r.getAs[Long]("tri"), r.getAs[Double]("coeff"))))
        .toMap
      assert(got.keySet === adj.keySet)
      adj.foreach { case (v, ns) =>
        val (deg, tri, coeff) = got(v)
        assert(deg === ns.size.toLong, s"deg mismatch for $v at $dir")
        val t = ns.toSeq.combinations(2).count { case Seq(x, y) =>
          adj(x).contains(y)
        }
        assert(tri === t.toLong, s"triangle count mismatch for $v at $dir")
        val want = if (ns.size >= 2)
          BigDecimal(2.0 * t / (ns.size.toLong * (ns.size - 1)))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        else 0.0
        assert(math.abs(coeff - want) < 1e-9, s"coeff mismatch for $v at $dir")
      }
    }
  }

  test("planted K4 survives the 4-truss; attached triangle and pendant peel away") {
    import spark.implicits._
    // order 10 -> K4 over parts 1-4; order 20 -> triangle {4,5,6} hanging
    // off the clique at 4; order 30 -> pendant edge (6,7)
    val rows = Seq(10L -> Seq(1L, 2L, 3L, 4L), 20L -> Seq(4L, 5L, 6L),
      30L -> Seq(6L, 7L)).flatMap { case (o, parts) => parts.map(p => (o, p)) }
    val tmp = java.nio.file.Files.createTempDirectory("ktruss").toString
    rows.toDF("l_orderkey", "l_partkey").write.parquet(s"$tmp/lineitem.parquet")
    val got = GraphQueries.ktruss(spark, tmp, 4, 3).collect()
      .map(r => (r.getAs[Int]("round"), r.getAs[Long]("n_edges"))).toSeq
    // round 1: pendant (6,7) and the triangle edges not inside K4 all have
    // support < 2 and drop together, leaving the 6 clique edges stable
    assert(got === Seq((1, 6L), (2, 6L), (3, 6L)), s"got $got")
  }
}
