package graft

import graft.queries.MultimodalQueries
import graft.sources.Multimodal
import org.apache.spark.sql.functions._

/** Walsh-Hadamard perceptual hash: driver-side recompute over the real
  * fixture, bucket-count consistency, and the sampling contract — a byte
  * change BETWEEN thumbnail sample points leaves the hash identical, while
  * identical blobs always collide.
  */
class MmPhashSpec extends SparkSpec {

  private def refHash(bytes: Array[Byte]): Long = {
    val n = bytes.length
    val px = Array.tabulate(64)(i => if (n == 0) 0L else (bytes(i * n / 64) & 0xffL))
    val cs = for { rf <- 0 until 4; cf <- 0 until 4 } yield {
      val j = rf * 8 + cf
      (0 until 64).map(i =>
        if (java.lang.Integer.bitCount(j & i) % 2 == 0) px(i) else -px(i)).sum
    }
    val med = cs.sorted.apply(7)
    cs.zipWithIndex.foldLeft(0L) { case (acc, (c, b)) =>
      if (c > med) acc | (1L << b) else acc
    }
  }

  test("query equals driver recompute; bucket sizes consistent (sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    val texts = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).getBytes("UTF-8")).toMap
    val rows = MultimodalQueries.phash(spark, dir).collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Long]("phash"), r.getAs[Long]("bucket_size")))
    assert(rows.map(_._1).toSet === texts.keySet)
    val byHash = rows.groupBy(_._2)
    rows.foreach { case (id, h, bs) =>
      assert(h === refHash(texts(id)), s"hash mismatch for doc $id")
      assert(bs === byHash(h).length.toLong, s"bucket size mismatch for doc $id")
    }
  }

  test("audio energy: planted quiet/loud frames report exact integers") {
    import spark.implicits._
    // frame 0: all samples = 257 (bytes 1,1) -> energy 32*257^2; frames
    // 1-2: all samples = 2 (bytes 2,0) -> energy 32*4 = 128, both under
    // half the mean; 10 trailing bytes truncate
    val loud = Array.fill(32)(Array[Byte](1, 1)).flatten
    val quiet = Array.fill(32)(Array[Byte](2, 0)).flatten
    val blob = loud ++ quiet ++ quiet ++ Array.fill(10)(3.toByte)
    val ds = Seq((7L, "audio", blob)).toDF("id", "kind", "media")
      .as[Multimodal.MediaRecord]
    val frames = Multimodal.audioEnergyStub(ds).collect()
      .map(f => f.frame_no -> (f.energy, f.peak)).toMap
    assert(frames.keySet === Set(0L, 1L, 2L), "tail must truncate")
    assert(frames(0L) === (32L * 257 * 257, 257L))
    assert(frames(1L) === (128L, 2L))
    assert(frames(2L) === (128L, 2L))
  }

  test("identical blobs collide; a change between sample points is invisible") {
    import spark.implicits._
    val base = ("x" * 200).getBytes("UTF-8")
    // sample points for n=200 are i*200/64 — position 1 is never sampled
    // (i=0 -> 0, i=1 -> 3), so flipping it must not move the hash
    val tweaked = base.clone(); tweaked(1) = 'Q'.toByte
    val blobs = Seq(1L -> base, 2L -> base.clone(), 3L -> tweaked)
    val ds = blobs.toDF("id", "media")
      .select(col("id"), lit("image").as("kind"), col("media"))
      .as[Multimodal.MediaRecord]
    val got = Multimodal.phashStub(ds).collect().map(h => h.id -> h.phash).toMap
    assert(got(1L) === got(2L), "identical blobs must collide")
    assert(got(1L) === got(3L), "unsampled byte must not affect the thumbnail hash")
    assert(got(1L) === refHash(base))
  }
}
