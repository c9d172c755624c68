package graft

import graft.queries.GraphQueries
import org.apache.spark.sql.functions._

/** Bellman-Ford weighted shortest paths vs an INDEPENDENT driver-side
  * Dijkstra over the identical weighted edge list, plus the fixpoint
  * proof the registry's fixed-round contract rests on: round 21 changes
  * nothing, so the 20-round answer IS the true weighted-distance map
  * (not an artifact of where the unrolling stopped).
  */
class GraphSsspSpec extends SparkSpec {

  private def weightedEdges(dir: String): Seq[(Long, Long, Long)] = {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .filter(col("l_partkey") % 10 === col("l_suppkey") % 10)
      .select(col("l_partkey").as("u"), (col("l_suppkey") + 1000000L).as("v"))
      .distinct()
    val und = li.union(li.select(col("v").as("u"), col("u").as("v"))).distinct()
    und.select(col("u"), col("v"),
        (graft.plans.Fnv1a64.ihash31(concat(
          least(col("u"), col("v")).cast("string"), lit("|"),
          greatest(col("u"), col("v")).cast("string"))) % 1000L + 1L).as("w"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
  }

  private def dijkstra(edges: Seq[(Long, Long, Long)]): Map[Long, Long] = {
    val adj = edges.groupBy(_._1).map { case (u, es) =>
      u -> es.map(e => (e._2, e._3))
    }
    val dist = scala.collection.mutable.Map.empty[Long, Long]
    val pq = scala.collection.mutable.PriorityQueue.empty[(Long, Long)](
      Ordering.by[(Long, Long), Long](_._1).reverse)
    edges.map(_._1).distinct.filter(_ < 10).foreach { s =>
      dist(s) = 0L; pq.enqueue((0L, s))
    }
    while (pq.nonEmpty) {
      val (d, u) = pq.dequeue()
      if (d == dist(u)) {
        adj.getOrElse(u, Nil).foreach { case (v, w) =>
          if (dist.get(v).forall(_ > d + w)) {
            dist(v) = d + w; pq.enqueue((d + w, v))
          }
        }
      }
    }
    dist.toMap
  }

  test("bellman-ford equals driver dijkstra and is a fixpoint (two SFs)") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val got = GraphQueries.ssspBellmanFord(spark, dir, 20).collect()
        .map(r => r.getAs[Long]("vtx") -> r.getAs[Long]("dist")).toMap
      val want = dijkstra(weightedEdges(dir))
      assert(got === want, s"distance map mismatch at $dir")
      val again = GraphQueries.ssspBellmanFord(spark, dir, 21).collect()
        .map(r => r.getAs[Long]("vtx") -> r.getAs[Long]("dist")).toMap
      assert(again === got, s"round 21 changed distances at $dir — not converged")
    }
  }
}
