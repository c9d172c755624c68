package graft

import graft.queries.GraphQueries
import org.apache.spark.sql.functions._

/** Integer-exact HITS: the micro-unit recurrence is recomputed driver-side
  * (plain Scala longs — no Spark, no doubles in the accumulation) and must
  * match EXACTLY, and each side's max score must be 1.0 (the per-round
  * renormalization contract).
  */
class HitsSpec extends SparkSpec {

  private def refHits(edges: Seq[(Long, Long)], rounds: Int)
      : (Map[Long, Long], Map[Long, Long]) = {
    var hub = edges.map(_._1).distinct.map(_ -> 1000000L).toMap
    var auth = Map.empty[Long, Long]
    for (_ <- 1 to rounds) {
      val aRaw = edges.groupBy(_._2).map { case (sv, es) =>
        sv -> es.map(e => hub(e._1)).sum
      }
      val am = aRaw.values.max
      auth = aRaw.map { case (sv, a) =>
        sv -> math.round(a.toDouble / am * 1000000.0)
      }
      val hRaw = edges.groupBy(_._1).map { case (p, es) =>
        p -> es.map(e => auth(e._2)).sum
      }
      val hm = hRaw.values.max
      hub = hRaw.map { case (p, h) =>
        p -> math.round(h.toDouble / hm * 1000000.0)
      }
    }
    (hub, auth)
  }

  test("scores equal the driver-side integer recurrence (two SFs)") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val edges = spark.read.parquet(s"$dir/lineitem.parquet")
        .filter(col("l_partkey") % 10 === col("l_suppkey") % 10)
        .select(col("l_partkey"), (col("l_suppkey") + 1000000L))
        .distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val (hub, auth) = refHits(edges, 8)
      val got = GraphQueries.hits(spark, dir, 8).collect()
        .map(r => (r.getString(1), r.getLong(0)) -> r.getDouble(2)).toMap
      assert(got.count(_._1._1 == "hub") === hub.size)
      assert(got.count(_._1._1 == "auth") === auth.size)
      hub.foreach { case (p, h) =>
        assert(got(("hub", p)) === h / 1000000.0, s"hub $p at $dir")
      }
      auth.foreach { case (sv, a) =>
        assert(got(("auth", sv)) === a / 1000000.0, s"auth $sv at $dir")
      }
      assert(got.collect { case (("hub", _), v) => v }.max === 1.0)
      assert(got.collect { case (("auth", _), v) => v }.max === 1.0)
      assert(got.values.forall(v => v > 0.0 && v <= 1.0))
    }
  }
}
