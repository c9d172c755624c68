package graft

import graft.queries.MlQueries2
import org.apache.spark.sql.functions._

/** Bradley-Terry MM fit: contests, win totals, and both MM iterations are
  * recomputed driver-side from the raw fixture along an independent path
  * (ordered-pair tallies, no least/greatest canonicalization), and the
  * conservation + ordering sanity of the fit is pinned.
  */
class BradleyTerrySpec extends SparkSpec {

  test("matches the independent recurrence; wins conserve (two SFs)") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .select("doc_id", "source", "text").collect()
        .map { r =>
          val w = r.getString(2).split(" ", -1)
          (r.getLong(0), r.getString(1), w.distinct.length.toDouble / w.length)
        }
      val byG = docs.groupBy(d => d._1 >> 1)
      val wins = scala.collection.mutable.Map.empty[(String, String), Long]
      byG.values.foreach { g =>
        (for { a <- g.find(_._1 % 2 == 0); b <- g.find(_._1 % 2 == 1) } yield (a, b))
          .filter { case (a, b) => a._2 != b._2 }
          .foreach { case (a, b) =>
            val (winner, loser) = if (a._3 >= b._3) (a._2, b._2) else (b._2, a._2)
            wins((winner, loser)) = wins.getOrElse((winner, loser), 0L) + 1L
          }
      }
      val sources = wins.keys.flatMap(k => Seq(k._1, k._2)).toSeq.distinct.sorted
      def n(a: String, b: String) =
        wins.getOrElse((a, b), 0L) + wins.getOrElse((b, a), 0L)
      val wTot = sources.map(s0 =>
        s0 -> sources.filter(_ != s0).map(o => wins.getOrElse((s0, o), 0L)).sum).toMap
      var th = sources.map(_ -> 1000000L).toMap
      for (_ <- 1 to 2) {
        val raw = sources.map { i =>
          val dm = sources.filter(_ != i)
            .map(j => math.round(n(i, j).toDouble / (th(i) + th(j)) * 1.0e12)).sum
          i -> (if (dm == 0L) 1000000L
                else math.round(wTot(i).toDouble / dm * 1.0e18))
        }.toMap
        val sr = raw.values.sum
        th = raw.map { case (i, t) =>
          i -> math.max(1L, math.round(t.toDouble / sr * sources.length * 1.0e6))
        }
      }
      val got = MlQueries2.bradleyTerry(spark, dir).collect()
        .map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
      assert(got.keySet === sources.toSet)
      sources.foreach { s0 =>
        val (nc, nw, t) = got(s0)
        assert(nc === sources.filter(_ != s0).map(n(s0, _)).sum, s"contests $s0 at $dir")
        assert(nw === wTot(s0), s"wins $s0 at $dir")
        assert(t === th(s0) / 1.0e6, s"theta $s0 at $dir")
      }
      // conservation: every contest awards exactly one win
      assert(got.values.map(_._2).sum === got.values.map(_._1).sum / 2)
      // ordering sanity: the best win-rate source outranks the worst
      val rates = got.map { case (s0, (nc, nw, t)) => (nw.toDouble / nc, t) }
      assert(rates.maxBy(_._1)._2 >= rates.minBy(_._1)._2)
    }
  }
}
