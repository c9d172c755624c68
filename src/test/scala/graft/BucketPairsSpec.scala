package graft

import graft.queries.BucketPairs

/** Direct property pin for the shared intra-bucket pair generator (the
  * simhash-band / embedding-LSH / char-gram / semantic-cell families all
  * ride it — each is oracle-gated end to end, but an off-by-one here
  * would shift four oracles at once, so the combinatorial contract gets
  * its own spec): for ANY member list, `pairs` emits exactly the
  * n-choose-2 position-ordered pairs — duplicates preserved (callers own
  * distinct()), empty and singleton buckets emit nothing, keep-columns
  * ride along unchanged.
  */
class BucketPairsSpec extends SparkSpec {
  import spark.implicits._

  test("emits exactly the n-choose-2 position pairs; duplicates preserved") {
    val rnd = new scala.util.Random(41L)
    // 0..6 members from a 4-value space: empty/singleton buckets and
    // duplicate members are all frequent
    val rows = (1 to 40).map { b =>
      val n = rnd.nextInt(7)
      (b.toLong, (1 to n).map(_ => rnd.nextInt(4).toLong).sorted)
    }
    val got = BucketPairs.pairs(rows.toDF("bucket", "members"),
        "members", "a", "b", keep = Seq("bucket"))
      .select("bucket", "a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      .groupBy(identity).view.mapValues(_.size).toMap
    val want = rows.flatMap { case (bkt, m) =>
      for (i <- m.indices; j <- i + 1 until m.size) yield (bkt, m(i), m(j))
    }.groupBy(identity).view.mapValues(_.size).toMap
    assert(got == want)
    assert(got.values.sum ==
      rows.map { case (_, m) => m.size * (m.size - 1) / 2 }.sum)
  }
}
