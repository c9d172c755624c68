package graft

import graft.queries.TextQueries
import org.apache.spark.sql.functions._

/** Winnowing fingerprints: the selection is recomputed driver-side from an
  * independent implementation (explicit rightmost-min scan, no key
  * encoding) over the real fixture, and the scheme's guarantee — any
  * shared substring of length ≥ W+K−1 = 8 yields a shared fingerprint —
  * is exercised on planted docs.
  */
class WinnowingSpec extends SparkSpec {

  private val K = 5; private val W = 4

  private def fnv31(sz: String): Long = {
    var h = -3750763034362895579L
    sz.getBytes("UTF-8").foreach(b => h = (h ^ (b & 0xffL)) * 1099511628211L)
    h & 0x7fffffffL
  }

  /** Reference winnowing: for each window pick the min hash, rightmost on
    * ties; dedupe selections by position. */
  private def winnow(text: String): Set[(Int, Long)] = {
    val hs = (0 to text.length - K).map(i => fnv31(text.substring(i, i + K)))
    (W - 1 until hs.length).map { e =>
      var best = e - W + 1
      ((e - W + 1) to e).foreach { i => if (hs(i) <= hs(best)) best = i }
      (best, hs(best))
    }.toSet
  }

  test("selection equals the independent rightmost-min scan (sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = TextQueries.winnowFingerprints(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_id"),
        (r.getAs[Long]("pos").toInt, r.getAs[Long]("fp"))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val want = docs.filter(_._2.length >= W + K - 1)
      .map { case (id, t) => id -> winnow(t) }
    assert(got.keySet === want.keySet)
    want.foreach { case (id, fps) =>
      assert(got(id) === fps, s"fingerprint set mismatch for doc $id")
    }
  }

  test("shared substring of length >= 8 implies a shared fingerprint") {
    import spark.implicits._
    val shared = "QWERTYUIOPAS" // 12 chars > W+K-1
    val doc1 = "aaabbbcccddd" + shared + "eeefffggg"
    val doc2 = "zzzyyyxxx" + shared + "wwwvvvuuu"
    val doc3 = "mmmnnnooopppqqqrrrsssttt" // no shared 8-run with 1/2
    val tmp = java.nio.file.Files.createTempDirectory("winspec").toString
    Seq((1L, doc1), (2L, doc2), (3L, doc3))
      .map { case (id, t) => (id, t, "en", "synth", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$tmp/documents.parquet")
    val fps = TextQueries.winnowFingerprints(spark, tmp).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("fp")))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert((fps(1L) intersect fps(2L)).nonEmpty,
      "planted 12-char overlap produced no shared fingerprint")
    assert((fps(1L) intersect fps(3L)).isEmpty &&
      (fps(2L) intersect fps(3L)).isEmpty,
      "disjoint docs unexpectedly share a fingerprint")
  }
}
