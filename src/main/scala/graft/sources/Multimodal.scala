package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: images/audio/video ride through the engine as
  * opaque `binary` columns with typed metadata, processed per-partition in
  * batches (north-star op).
  *
  * The decode step itself is STUBBED — this container has no image/audio
  * codecs — with a deterministic fake (`fakeDecode`) so the Spark-side
  * contract (schema, batching, partitioning, null behavior) is real and
  * tested end-to-end. Swap `decodeBatch` for a real codec (JNI/FFI) without
  * touching anything else.
  *
  * Scale notes: media blobs dominate row size, so (a) metadata-only
  * predicates must be pushed BEFORE the decode (`withMeta` projects
  * metadata without touching bytes — parquet column pruning means undecoded
  * blobs are never even read when dropped), and (b) decode runs inside
  * `mapPartitions` so a codec can amortize init per-partition, the same
  * batch shape `mapInPandas`/Arrow gives Python pipelines.
  */
object Multimodal {

  /** A media row: opaque bytes + the metadata a catalog would carry. */
  case class MediaRecord(id: Long, kind: String, media: Array[Byte])

  /** Decoded features (deterministic stub of the real codec output). */
  case class MediaFeatures(id: Long, kind: String, n_bytes: Long,
      width: Long, height: Long, channels: Long)

  /** Deterministic fake "decode": derives plausible dimensions from the
    * bytes alone. Replace with a real codec; everything downstream holds.
    */
  def fakeDecode(id: Long, kind: String, bytes: Array[Byte]): MediaFeatures = {
    val n = bytes.length.toLong
    val first = if (bytes.isEmpty) 0L else (bytes(0) & 0xffL)
    MediaFeatures(id, kind, n, 64L + n % 577L, 64L + (first * 7L + n) % 353L, 3L)
  }

  /** Per-partition batched decode — the real plumbing. One codec init per
    * partition, streaming iterator in/out (no partition-sized buffering).
    */
  def decodeBatch(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // real impl: val codec = Codec.open(); it.map(... codec.decode ...)
      it.map(r => fakeDecode(r.id, r.kind, r.media))
    }
  }

  /** Build a media table from the documents table: text bytes standing in
    * for encoded blobs (binary column + metadata, the schema is the point).
    */
  def fromDocuments(spark: SparkSession, sfDir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").as("id"), lit("image").as("kind"),
        col("text").cast("binary").as("media"))
      .as[MediaRecord]
  }

  /** Stubbed media transforms — deterministic byte-level fakes with the real
    * Spark plumbing (typed Datasets, per-partition execution). Swap the
    * bodies for codecs; signatures and partitioning hold.
    */
  /** "Resize": in a real pipeline decode→scale→re-encode; here a
    * deterministic byte subsample that preserves determinism and length
    * proportionality.
    */
  def resizeStub(media: Dataset[MediaRecord], factor: Int): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map(r => r.copy(media = r.media.zipWithIndex.collect {
        case (b, i) if i % factor == 0 => b
      }))
    }
  }

  /** "Frame sampling": treat the blob as a stream of fixed-size frames and
    * emit every `stride`-th frame as its own record (1→N generator through
    * a typed flatMap — the video-ingest shape).
    */
  case class Frame(id: Long, frame_no: Long, frame: Array[Byte])

  def frameSampleStub(media: Dataset[MediaRecord], frameSize: Int, stride: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      r.media.grouped(frameSize).zipWithIndex.collect {
        case (bytes, i) if i % stride == 0 => Frame(r.id, i.toLong, bytes.toArray)
      }
    }
  }

  /** Size/metadata projection. (Computing octet_length still scans the blob
    * column once; a production catalog materializes n_bytes as metadata so
    * even this scan prunes the blobs — the seam to do that is here.)
    */
  def withMeta(media: Dataset[MediaRecord]): DataFrame =
    media.toDF().select(col("id"), col("kind"), octet_length(col("media")).as("n_bytes"))

  case class FrameEnergy(id: Long, frame_no: Long, energy: Long, peak: Long)

  /** Audio feature extraction over the decode stub — the PCM half of the
    * multimodal contract (images get `phashStub`): the blob reads as
    * little-endian int16 samples (the real codec goes here; ASCII fixture
    * bytes make every sample positive, but the sign fold is the honest
    * PCM formula), framed at 32 samples (64 bytes, tail truncated), and
    * each frame reports Σs² energy and peak |s| — the primitives under
    * VAD/silence trimming. Integer-exact end to end, same per-partition
    * typed batch shape as decodeBatch.
    */
  def audioEnergyStub(media: Dataset[MediaRecord],
      frameSamples: Int = 32): Dataset[FrameEnergy] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      r.media.grouped(2 * frameSamples).zipWithIndex.collect {
        case (bytes, i) if bytes.length == 2 * frameSamples =>
          var energy = 0L
          var peak = 0L
          var j = 0
          while (j < frameSamples) {
            val raw = (bytes(2 * j) & 0xff) + 256 * (bytes(2 * j + 1) & 0xff)
            val s = if (raw >= 32768) raw - 65536 else raw
            energy += s.toLong * s
            if (math.abs(s) > peak) peak = math.abs(s)
            j += 1
          }
          FrameEnergy(r.id, i.toLong, energy, peak)
      }
    }
  }

  case class MediaHash(id: Long, phash: Long)

  /** Perceptual hash over the decode stub — the image near-dup primitive
    * (pHash family), with the transform made INTEGER-EXACT so the whole
    * pipeline has a SQL oracle: (1) "thumbnail" the blob to 64 evenly
    * sampled byte-pixels (the real decode+downscale goes here), (2) take
    * the 2-D Walsh-Hadamard transform — ±1 weights, the integer cousin of
    * pHash's DCT; coefficient j = Σᵢ (−1)^popcount(j∧i)·pxᵢ over the
    * natural-order index pairing — (3) keep the 16 low-frequency
    * coefficients (row,col < 4 of the 8×8 grid) and set bit b when the
    * coefficient exceeds their lower median. Identical blobs hash
    * identically; near-identical blobs differ in few bits (Hamming-
    * bucketable, the dedup_simhash banding applies downstream). Runs in
    * the same per-partition typed batch shape as decodeBatch.
    */
  def phashStub(media: Dataset[MediaRecord]): Dataset[MediaHash] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val n = r.media.length
        // long arithmetic: i * n overflows Int for blobs > ~34 MB (real
        // media sizes), and the SQL oracle computes (i*n)//64 unbounded
        val px = Array.tabulate(64) { i =>
          if (n == 0) 0L else (r.media((i.toLong * n / 64).toInt) & 0xffL)
        }
        val coeffs = for { rf <- 0 until 4; cf <- 0 until 4 } yield {
          val j = rf * 8 + cf
          var s = 0L
          var i = 0
          while (i < 64) {
            s += (if (java.lang.Integer.bitCount(j & i) % 2 == 0) px(i) else -px(i))
            i += 1
          }
          s
        }
        val med = coeffs.sorted.apply(7) // lower median of the 16
        val h = coeffs.zipWithIndex.foldLeft(0L) { case (acc, (c, b)) =>
          if (c > med) acc | (1L << b) else acc
        }
        MediaHash(r.id, h)
      }
    }
  }
}
