package graft

import graft.plans.HeavyHittersAgg
import org.apache.spark.sql.functions._

/** Misra-Gries native aggregate: the deficiency theorem (every estimate in
  * [true − n/(k+1), true], provably-heavy items always present) must hold
  * under every partitioning of a skewed stream; plus unit semantics of the
  * buffer — bounded size, classic decrement behavior, the mergeable-
  * summaries merge rule, and serde.
  */
class HeavyHittersSpec extends SparkSpec {

  test("deficiency bound and membership hold under hostile partitionings") {
    import spark.implicits._
    // Zipf-ish stream: item i (1..40) appears 1000/i times, n ≈ 4279
    val stream = (1 to 40).flatMap(i => Seq.fill(1000 / i)(s"w$i"))
    val n = stream.length.toLong
    val exact = stream.groupBy(identity).map { case (w, xs) => w -> xs.length.toLong }
    val k = 10
    for (parts <- Seq(1, 7, 32)) {
      val df = stream.toDF("word").repartition(parts)
      val got = df.agg(HeavyHittersAgg.heavyHitters(col("word"), k).as("hh"))
        .select(explode(col("hh")).as("e"))
        .select(col("e.item"), col("e.est"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got.size <= k, s"summary exceeded k with $parts partitions")
      got.foreach { case (w, est) =>
        assert(est <= exact(w), s"$w overcounted with $parts partitions")
        assert((exact(w) - est) * (k + 1) <= n,
          s"$w deficiency bound broken with $parts partitions")
      }
      exact.filter(_._2 * (k + 1) > n).foreach { case (w, cnt) =>
        assert(got.contains(w),
          s"provably-heavy $w (cnt $cnt, n $n) missing with $parts partitions")
      }
    }
  }

  test("buffer: classic MG decrement, merge rule, serde") {
    val b = new HeavyHittersAgg.Buffer(2)
    Seq("a", "a", "b", "c").foreach(b.add) // c triggers decrement-all
    assert(b.sorted.toSeq === Seq(("a", 1L)), "a:2,b:1 minus c's decrement")
    val x = new HeavyHittersAgg.Buffer(2)
    Seq("a", "a", "a", "b").foreach(x.add)
    val y = HeavyHittersAgg.Buffer.fromBytes(2, {
      val t = new HeavyHittersAgg.Buffer(2)
      Seq("a", "c", "c").foreach(t.add)
      t.toBytes
    })
    // merged raw: a:4, b:1, c:2 → subtract 3rd-largest (1), keep positive
    assert(x.mergeWith(y).sorted.toSeq === Seq(("a", 3L), ("c", 1L)))
  }
}
