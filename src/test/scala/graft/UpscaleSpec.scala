package graft

import graft.queries.QualityQueries
import graft.tools.Upscale
import org.apache.spark.sql.functions._

/** The dev upscaler's embedding perturbation (r9, verdict #2): replicas
  * get a replica-keyed orthogonal signed permutation so they stop being
  * cross-replica near-duplicates. Pins the three properties the sf10+
  * gates rely on: (1) copies=1 is the byte-equal identity, (2) intra-
  * replica geometry (norms, pairwise dot products) matches the base
  * fixture to float-sum-order — the same product multiset in permuted
  * order, far inside the queries' 1e-6 micro-rounding — and (3)
  * bit-identical copies stop being near-dups: the semantic-dedup answer
  * stays linear in the replication and its replica-0 slice IS the base
  * answer.
  */
class UpscaleSpec extends SparkSpec {

  private val Unit64 = 1L << 34

  private def collectEmb(dir: String): Map[Long, Array[Float]] =
    spark.read.parquet(s"$dir/embeddings.parquet").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap

  private def upscaledEmb(copies: Int): Map[Long, Array[Float]] =
    Upscale.upscaled(spark, sf, "embeddings", copies).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap

  // deterministic left-to-right double accumulation — the same coordinate
  // order both engines and the assertions below use
  private def dot(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var j = 0
    while (j < a.length) { s += a(j).toDouble * b(j).toDouble; j += 1 }
    s
  }
  private def cos(a: Array[Float], b: Array[Float]): Double =
    dot(a, b) / math.sqrt(dot(a, a) * dot(b, b))

  test("copies=1 upscale is the byte-equal identity (replica 0 untouched)") {
    val base = collectEmb(sf)
    val up = upscaledEmb(1)
    assert(up.keySet === base.keySet)
    base.foreach { case (id, v) =>
      assert(java.util.Arrays.equals(up(id), v), s"vector $id changed under copies=1")
    }
  }

  test("intra-replica geometry is preserved to float-sum-order in every replica") {
    val base = collectEmb(sf)
    val up = upscaledEmb(3)
    val ids = base.keySet.toSeq.sorted.take(40)
    // a signed permutation preserves the coordinate-product MULTISET of
    // any pairwise dot product — only the accumulation order moves, so
    // values agree to ~1e-15 relative and the sorted product list agrees
    // bit-for-bit; the queries' 1e-6 micro-rounded decisions cannot see
    // an order-of-summation wiggle that small
    def close(a: Double, b: Double): Boolean =
      math.abs(a - b) <= 1e-12 * math.max(1.0, math.max(math.abs(a), math.abs(b)))
    def productMultiset(a: Array[Float], b: Array[Float]): Seq[Float] =
      a.zip(b).map { case (x, y) => x * y }.sorted.toSeq
    for (rep <- 0 until 3) {
      val off = rep * Unit64
      ids.foreach { id =>
        assert(close(dot(up(id + off), up(id + off)), dot(base(id), base(id))),
          s"norm changed for vector $id in replica $rep")
        assert(productMultiset(up(id + off), up(id + off)) ===
          productMultiset(base(id), base(id)),
          s"squared-coordinate multiset changed for $id in replica $rep")
      }
      for (a <- ids; b <- ids if a < b) {
        assert(close(dot(up(a + off), up(b + off)), dot(base(a), base(b))),
          s"dot($a,$b) changed in replica $rep")
      }
    }
  }

  test("bit-identical copies stop being near-duplicates across replicas") {
    val base = collectEmb(sf)
    val up = upscaledEmb(3)
    val ids = base.keySet.toSeq.sorted
    // every (replica pair, vector) copy pair: cosine must collapse from
    // 1.0 into the random-signed-permutation regime. The measured sf0.1
    // tail is P(|cos| > tau=0.4) ~ 8e-4 with max ~0.54 — a THIN tail is
    // the honest contract (a ±diagonal alone left 7% of copies above
    // tau on these concentrated vectors), so pin the regime, not zero
    val copyCos = for {
      (ri, rk) <- Seq((0, 1), (0, 2), (1, 2)); id <- ids
    } yield math.abs(cos(up(id + ri * Unit64), up(id + rk * Unit64)))
    assert(copyCos.max < 0.75,
      f"a copy pair survives at |cos|=${copyCos.max}%.3f — outside the measured regime")
    assert(copyCos.count(_ > 0.4).toDouble / copyCos.size < 0.01,
      "more than 1% of copy pairs above tau — the clique kill failed")
    assert(copyCos.sum / copyCos.size < 0.15,
      "mean copy-pair |cosine| should sit in the random-sign regime")
  }

  test("semantic dedup on an upscaled dir: replica-0 slice equals the base answer, pair set stays linear") {
    val tmp = java.nio.file.Files.createTempDirectory("upscale3").toString
    Upscale.upscaled(spark, sf, "embeddings", 3)
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val basePairs = QualityQueries.semanticDedup(spark, sf).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val upAll = QualityQueries.semanticDedup(spark, tmp).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    val rep0 = upAll.filter(p => p._1 < Unit64 && p._2 < Unit64).toSet
    assert(rep0 === basePairs,
      "replica-0 slice of the upscaled answer must BE the base answer")
    // linearity: ~one base answer per replica plus at most a thin
    // random-sign tail — never the C(copies,2) clique regime, where 3
    // bit-identical replicas alone would add 3 pairs PER VECTOR
    val nVec = collectEmb(sf).size
    assert(upAll.length < 3 * basePairs.size + nVec / 2,
      s"${upAll.length} pairs from ${basePairs.size} base pairs x3 — quadratic regime")
    // surviving identical-copy pairs (same base id across two replicas)
    // must be inside the measured ~8e-4 tail, not the clique regime
    // where EVERY copy pair (3 per vector here) would appear
    val copies = upAll.count(p => (p._2 - p._1) % Unit64 == 0)
    assert(copies <= math.max(1, (3 * nVec) / 100),
      s"$copies identical-copy pairs survived — clique regime, not a thin tail")
  }
}
