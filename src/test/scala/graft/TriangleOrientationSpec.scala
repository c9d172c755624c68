package graft

import graft.queries.GraphQueries
import org.apache.spark.sql.functions._

/** Skew robustness of the degree-oriented triangle enumeration: on a star
  * graph the hub generates ZERO wedges under degree orientation (all its
  * edges point at it), where id orientation would generate C(n,2). This is
  * the property that keeps the two-path intermediate at |E|^1.5 instead of
  * Σdeg² on a power-law graph at 100 TB.
  */
class TriangleOrientationSpec extends SparkSpec {

  /** Star K1,n with hub id 0 (the SMALLEST id — worst case for id
    * orientation) over leaves 1..n, plus leaf-leaf edges (1,2) and (3,4)
    * closing exactly two triangles {0,1,2} and {0,3,4}.
    */
  private def starEdges(n: Int) = {
    import spark.implicits._
    ((1 to n).map(i => (0L, i.toLong)) ++ Seq((1L, 2L), (3L, 4L)))
      .toDF("u", "v")
  }

  test("degree orientation bounds star-graph wedges; id orientation explodes") {
    val n = 200
    val e = starEdges(n)
    // id orientation: hub 0 has out-degree n -> C(n,2) wedges + the two
    // leaf pairs' contributions. This is the quadratic blow-up.
    val idWedges = e.select(col("u").as("x"), col("v").as("y"))
      .join(e.select(col("u").as("x2"), col("v").as("z")),
        col("x") === col("x2") && col("y") < col("z"))
      .count()
    assert(idWedges >= n.toLong * (n - 1) / 2,
      s"id-oriented wedges $idWedges should include the hub's C($n,2)")
    // degree orientation: hub has max degree, so every hub edge points AT
    // it and only the degree-2 leaves (1 and 3) emit one wedge each.
    val degWedges = GraphQueries.orientedWedges(GraphQueries.orientByDegree(e))
    assert(degWedges.count() == 2L,
      "degree-oriented star wedges must collapse to the two closing pairs")
  }

  test("random graphs: oriented closure equals the naive triangle count") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import spark.implicits._
    val edgeGen = for {
      n <- Gen.choose(4, 14) // vertex count
      edges <- Gen.listOf(for {
        u <- Gen.choose(0, n - 1); v <- Gen.choose(0, n - 1) if u != v
      } yield (math.min(u, v).toLong, math.max(u, v).toLong))
    } yield edges.distinct
    (0 until 15).foreach { i =>
      edgeGen(Gen.Parameters.default, Seed(7L + i)).foreach { edges =>
        if (edges.nonEmpty) {
          // naive reference: count vertex triples with all three edges
          val es = edges.toSet
          val vs = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
          val naive = (for {
            a <- vs; b <- vs if a < b; c <- vs if b < c
            if es((a, b)) && es((b, c)) && es((a, c))
          } yield 1).size.toLong
          val e = edges.toDF("u", "v")
          val got = GraphQueries.closedTriangles(
            GraphQueries.orientByDegree(e)).count()
          assert(got == naive,
            s"seed ${7L + i}: oriented count $got != naive $naive on ${edges.size} edges")
        }
      }
    }
  }

  test("oriented closure still counts each triangle exactly once") {
    val e = starEdges(50)
    val tri = GraphQueries.closedTriangles(GraphQueries.orientByDegree(e))
    assert(tri.count() == 2L, "star + (1,2) + (3,4) has exactly 2 triangles")
    // orientation acyclicity: no edge can have ord(a) >= ord(b) -- a >= b
    // in the packed (deg, id) order would double- or zero-count a triangle
    val deg = e.select(col("u").as("vtx")).union(e.select(col("v").as("vtx")))
      .groupBy("vtx").agg(count(lit(1)).as("deg"))
    val bad = GraphQueries.orientByDegree(e)
      .join(deg.select(col("vtx").as("a"), col("deg").as("da")), "a")
      .filter(GraphQueries.vertexOrd(col("da"), col("a")) >= col("bord"))
    assert(bad.count() == 0L, "every oriented edge must satisfy ord(a) < ord(b)")
  }

  test("packed vertexOrd preserves (deg, id) order and rejects wide ids") {
    import spark.implicits._
    // numeric order on the packed long == lexicographic (deg, id) order,
    // including a capped-degree pair falling back to id order
    val rows = Seq( // (deg, id) in expected ascending ord order
      (1L, 5L), (1L, 6L), (2L, 0L), (40000L, 3L), (50000L, 4L))
    val packed = rows.toDF("deg", "id")
      .select(GraphQueries.vertexOrd(col("deg"), col("id")).as("o"))
      .collect().map(_.getLong(0))
    assert(packed.toSeq == packed.sorted.toSeq,
      s"packed ords must ascend with (capped-deg, id): ${packed.toSeq}")
    assert(packed.distinct.length == packed.length,
      "packing must stay injective (ids differ => ords differ)")
    // ids past 48 bits must raise, not silently mis-orient
    val err = intercept[Exception] {
      Seq((1L, 1L << 48)).toDF("deg", "id")
        .select(GraphQueries.vertexOrd(col("deg"), col("id")))
        .collect()
    }
    assert(err.getMessage != null)
  }
}
