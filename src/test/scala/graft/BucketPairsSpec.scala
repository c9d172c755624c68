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

  test("pairsBlocked emits the identical multiset for every block/list-size ratio") {
    val rnd = new scala.util.Random(43L)
    // lists straddling the block boundary: n < block, n == block,
    // n in (block, 2*block], n >> block — plus duplicates and keep-less
    // anonymous buckets (the lsh call shape)
    for (block <- Seq(1, 2, 3, 7)) {
      val rows = (1 to 12).map { b =>
        val n = rnd.nextInt(3 * block + 2)
        (b.toLong, (1 to n).map(_ => rnd.nextInt(5).toLong).sorted)
      }
      val df = rows.toDF("bucket", "members")
      val want = BucketPairs.pairs(df, "members", "a", "b",
          keep = Seq("bucket")).select("bucket", "a", "b").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
        .groupBy(identity).view.mapValues(_.size).toMap
      val got = BucketPairs.pairsBlocked(df, "members", "a", "b",
          keep = Seq("bucket"), block = block).select("bucket", "a", "b")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
        .groupBy(identity).view.mapValues(_.size).toMap
      assert(got == want, s"block=$block must not change the pair multiset")
      // anonymous buckets (keep = Nil): the list column itself keys the
      // chunk repartition — same multiset when buckets are indistinct
      val wantAnon = BucketPairs.pairs(df, "members", "a", "b")
        .select("a", "b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
        .groupBy(identity).view.mapValues(_.size).toMap
      val gotAnon = BucketPairs.pairsBlocked(df, "members", "a", "b",
          block = block).select("a", "b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
        .groupBy(identity).view.mapValues(_.size).toMap
      assert(gotAnon == wantAnon,
        s"block=$block keep-less form must not change the pair multiset")
    }
  }
}
