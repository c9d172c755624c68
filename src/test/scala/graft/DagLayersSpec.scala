package graft

import graft.queries.GraphQueries
import org.apache.spark.sql.functions._

/** DAG critical-path layering vs an independent driver-side topological DP
  * (vertices in ascending id order ARE a topological order of the u < v
  * DAG), plus the fixed-round fixpoint proof: round 46 changes nothing.
  */
class DagLayersSpec extends SparkSpec {

  test("layer histogram equals the topological DP; 45 rounds reach the fixpoint") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val li = spark.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      val edges = li.as("a").join(li.as("b"),
          col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
        .groupBy(col("a.pk").as("u"), col("b.pk").as("v"))
        .agg(count(lit(1)).as("w")).filter(col("w") >= 2)
        .select("u", "v")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      val preds = edges.groupBy(_._2).map { case (v, es) => v -> es.map(_._1) }
      val vts = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
      val layer = scala.collection.mutable.Map.empty[Long, Int]
      vts.foreach { v => // ascending id = topological order (u < v edges)
        layer(v) = preds.get(v).map(_.map(u => layer(u) + 1).max).getOrElse(0)
      }
      val want = layer.values.groupBy(identity).view
        .mapValues(_.size.toLong).toMap
      val got = GraphQueries.dagLayers(spark, dir, 45).collect()
        .map(r => r.getAs[Int]("layer") -> r.getAs[Long]("n_vertices")).toMap
      assert(got === want, s"layer histogram mismatch at $dir")
      val again = GraphQueries.dagLayers(spark, dir, 46).collect()
        .map(r => r.getAs[Int]("layer") -> r.getAs[Long]("n_vertices")).toMap
      assert(again === got, s"round 46 changed layers at $dir — not converged")
    }
  }
}
