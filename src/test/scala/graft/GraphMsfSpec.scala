package graft

import graft.queries.GraphQueries
import org.apache.spark.sql.functions._

/** Borůvka minimum spanning forest vs an INDEPENDENT driver-side Kruskal
  * under the identical (w, u, v) total order — with a strict total order
  * on edges the minimum spanning forest is unique, so the two edge SETS
  * must match exactly, not just their weights. Also proves the forest
  * invariants: acyclicity, |MSF| = |V| − #components, and spanning (the
  * forest connects exactly the components of the input graph).
  */
class GraphMsfSpec extends SparkSpec {

  private def kruskal(edges: Seq[(Long, Long, Long)])
      : (Set[(Long, Long, Long)], Map[Long, Long]) = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    val picked = scala.collection.mutable.Set.empty[(Long, Long, Long)]
    edges.sortBy { case (u, v, w) => (w, u, v) }.foreach { case (u, v, w) =>
      val (ru, rv) = (find(u), find(v))
      if (ru != rv) { parent(ru max rv) = ru min rv; picked += ((u, v, w)) }
    }
    val vtx = edges.flatMap(e => Seq(e._1, e._2)).distinct
    (picked.toSet, vtx.map(v => v -> find(v)).toMap)
  }

  test("boruvka equals kruskal under the shared total order (two SFs)") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val got = GraphQueries.boruvkaMsf(spark, dir).collect()
        .map(r => (r.getAs[Long]("u"), r.getAs[Long]("v"), r.getAs[Long]("w")))
      // recompute the weighted edge list with the same canonical hash
      val li = spark.read.parquet(s"$dir/lineitem.parquet")
        .filter(col("l_partkey") % 10 === col("l_suppkey") % 10)
        .select(col("l_partkey").as("u"), (col("l_suppkey") + 1000000L).as("v"))
        .distinct()
        .select(col("u"), col("v"),
          graft.plans.Fnv1a64.ihash31(concat(col("u").cast("string"),
            lit("|"), col("v").cast("string"))).as("w"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      val (want, roots) = kruskal(li)
      assert(got.toSet === want, s"edge set mismatch at $dir")
      assert(got.length === got.toSet.size, "duplicate forest edges")
      // |MSF| = |V| - #components
      val nComp = roots.values.toSet.size
      assert(got.length === roots.size - nComp)
      // spanning: the forest induces exactly the graph's component
      // partition (every vertex of G touches the forest because its
      // component has >= 2 vertices)
      val (_, forestRoots) = kruskal(got.toSeq)
      val byGraph = roots.keySet.groupBy(roots)
      val byForest = roots.keySet.groupBy(forestRoots)
      assert(byGraph.values.toSet === byForest.values.toSet,
        s"component partition mismatch at $dir")
    }
  }
}
